"""Neural Spectral Codec — TPU-native (JAX/XLA/Pallas/pjit) framework.

A ground-up TPU-first rebuild of the LiDAR loop-closure / place-recognition
pipeline of Kimun-Park/Neural-Spectral-Codec:

    raw LiDAR scan
      → panoramic range image (scatter-min projection, ops/range_image.py)
      → rotation-invariant 800-D spectral histogram (ops/spectral.py)
      → 4-criterion keyframe selection (keyframe/)
      → temporal graph + edge-conditioned 3-layer GAT (models/gnn.py)
      → two-stage retrieval: 1-D Wasserstein global search + geometric
        verification (retrieval/)
      → g2o pose-graph edges.

Design stance (not a port):
  * Per-scan Python loops in the reference become batched, jit-compiled,
    fixed-shape array programs (vmap over scans / keyframes / queries).
  * FFT + histogram binning lower to matmuls against precomputed bases so
    the hot path rides the MXU.
  * The GAT runs as dense masked attention over padded bounded-degree
    neighbor tensors instead of COO edge lists + scatter kernels.
  * Scaling is SPMD over a `jax.sharding.Mesh` (data-parallel training,
    node-sharded graphs with halo exchange, row-sharded retrieval DB),
    not NCCL/DataParallel.
"""

__version__ = "0.1.0"

from neural_spectral_codec_tpu import ops  # noqa: F401


def __getattr__(name):
    """Lazy top-level API: the common entry points are importable as
    ``neural_spectral_codec_tpu.X`` without paying for every subpackage
    (e.g. flax/optax) at import time."""
    _exports = {
        "SpectralEncoderConfig": "neural_spectral_codec_tpu.ops.spectral",
        "encode_points_batch": "neural_spectral_codec_tpu.ops.spectral",
        "pad_points": "neural_spectral_codec_tpu.ops.range_image",
        "KeyframeSelector": "neural_spectral_codec_tpu.keyframe.selector",
        "Keyframe": "neural_spectral_codec_tpu.keyframe.selector",
        "TemporalGraphManager": "neural_spectral_codec_tpu.keyframe.graph",
        "build_graph_from_keyframes": "neural_spectral_codec_tpu.keyframe.graph",
        "SpectralGNN": "neural_spectral_codec_tpu.models.gnn",
        "GNNTrainer": "neural_spectral_codec_tpu.training.trainer",
        "TripletMiner": "neural_spectral_codec_tpu.training.miner",
        "WassersteinRetriever": "neural_spectral_codec_tpu.retrieval.retriever",
        "TwoStageRetrieval": "neural_spectral_codec_tpu.retrieval.two_stage",
        "GeometricVerifier": "neural_spectral_codec_tpu.retrieval.verification",
        "NeuralSpectralCodecPipeline": "neural_spectral_codec_tpu.pipeline",
        "run_pipeline": "neural_spectral_codec_tpu.pipeline",
        "run_benchmark": "neural_spectral_codec_tpu.evaluation",
        "load_config": "neural_spectral_codec_tpu.utils.config",
        "Profiler": "neural_spectral_codec_tpu.utils.profiler",
    }
    if name in _exports:
        import importlib
        return getattr(importlib.import_module(_exports[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
