"""Two-stage loop-closure retrieval: W₁ global search + geometric verification."""

from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever  # noqa: F401
from neural_spectral_codec_tpu.retrieval.verification import (  # noqa: F401
    GeometricVerifier,
    voxel_downsample,
    verify_loop_closure,
    batch_verify_candidates,
)
from neural_spectral_codec_tpu.retrieval.two_stage import (  # noqa: F401
    LoopClosureCandidate,
    TwoStageRetrieval,
    create_two_stage_retrieval,
    batch_loop_closing,
)
from neural_spectral_codec_tpu.retrieval.g2o import (  # noqa: F401
    compute_pose_graph_edge,
    save_loop_closures_g2o,
)
