"""TPU compute kernels: projection, spectral encoding, Wasserstein, graph ops."""

from neural_spectral_codec_tpu.ops.range_image import (  # noqa: F401
    project_points,
    project_points_batch,
    interpolate_range_image,
    unproject_range_image,
    range_image_difference,
)
from neural_spectral_codec_tpu.ops.spectral import (  # noqa: F401
    SpectralEncoderConfig,
    compute_bin_edges,
    binning_matrix,
    pooling_matrix,
    encode_range_image,
    encode_range_image_batch,
    encode_points,
    encode_points_batch,
)
from neural_spectral_codec_tpu.ops.ring_path import (  # noqa: F401
    encode_points_ring_batch,
    encode_structured,
    infer_ring_ids_by_elevation,
    infer_ring_ids_from_sweep,
    infer_row_of_ring,
    points_to_rings,
    project_rings_batch,
    ring_structure_report,
)
from neural_spectral_codec_tpu.ops.quantization import (  # noqa: F401
    HistogramQuantizer,
    quantize,
    dequantize,
)
from neural_spectral_codec_tpu.ops.wasserstein import (  # noqa: F401
    wasserstein_1d,
    wasserstein_batch,
    wasserstein_matrix,
    histogram_cdf,
)
