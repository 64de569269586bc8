"""Keyframe selection and temporal graph construction (host-side streaming)."""

from neural_spectral_codec_tpu.keyframe.criteria import (  # noqa: F401
    KeyframeSelectionCriteria,
    estimate_keyframe_rate,
    analyze_keyframe_spacing,
)
from neural_spectral_codec_tpu.keyframe.selector import (  # noqa: F401
    Keyframe,
    KeyframeSelector,
    select_keyframes_from_kitti,
)
from neural_spectral_codec_tpu.keyframe.graph import (  # noqa: F401
    KeyframeGraph,
    build_graph,
    graph_to_coo,
    TemporalGraphManager,
)
