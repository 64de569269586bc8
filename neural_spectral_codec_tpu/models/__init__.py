"""Neural models: edge-conditioned GAT over the temporal keyframe graph."""

from neural_spectral_codec_tpu.models.gnn import (  # noqa: F401
    EdgeGATLayer,
    SpectralGNN,
    LocalUpdateGNN,
    create_spectral_gnn,
    init_gnn,
)
