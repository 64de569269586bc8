"""Host-side data layer: dataset readers, SE(3) pose math, synthetic data."""

from neural_spectral_codec_tpu.data.pose_utils import (  # noqa: F401
    inverse_pose,
    compose_poses,
    relative_pose,
    transform_points,
    euclidean_distance,
    rotation_angle,
    rotation_angle_degrees,
    interpolate_poses,
    pose_difference,
    is_valid_transformation,
    cartesian_to_spherical,
    spherical_to_cartesian,
    compute_overlap,
)
from neural_spectral_codec_tpu.data.kitti import KITTILoader  # noqa: F401
from neural_spectral_codec_tpu.data.nclt import NCLTLoader  # noqa: F401
from neural_spectral_codec_tpu.data.helipr import HeLiPRLoader  # noqa: F401
from neural_spectral_codec_tpu.data.multi_dataset import (  # noqa: F401
    MultiDatasetLoader,
    create_multi_dataset_loader,
)
from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader  # noqa: F401
