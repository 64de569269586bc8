"""SE(3) pose math — vectorized numpy host-side + JAX device variants.

Behavioral contract: /root/reference/src/data/pose_utils.py. Host functions
accept single poses like the reference; ``*_batch`` variants are vectorized
over leading axes (the reference's Python loops become array programs).
No scipy on the hot path: quaternions and SLERP in closed form.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from neural_spectral_codec_tpu.ops.quantization import (  # re-export for API parity
    matrix_to_quat_wxyz,
    quat_wxyz_to_matrix,
    pose_to_7dof,
    pose_from_7dof,
)

__all__ = [
    "pose_to_transformation_matrix", "transformation_matrix_to_pose",
    "inverse_pose", "compose_poses", "relative_pose", "transform_points",
    "euclidean_distance", "rotation_angle", "rotation_angle_degrees",
    "interpolate_poses", "pose_difference", "is_valid_transformation",
    "cartesian_to_spherical", "spherical_to_cartesian", "compute_overlap",
    "euclidean_distance_batch", "rotation_angle_batch",
    "pose_to_7dof", "pose_from_7dof",
]


def pose_to_transformation_matrix(position: np.ndarray, rotation: np.ndarray) -> np.ndarray:
    """[x,y,z] + (3,3) matrix or [w,x,y,z] quaternion → SE(3)
    (reference pose_utils.py:16-39)."""
    T = np.eye(4)
    T[:3, 3] = position
    if rotation.shape == (3, 3):
        T[:3, :3] = rotation
    elif rotation.shape == (4,):
        T[:3, :3] = quat_wxyz_to_matrix(rotation)
    else:
        raise ValueError(f"Invalid rotation shape: {rotation.shape}")
    return T


def transformation_matrix_to_pose(T: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return T[:3, 3], T[:3, :3]


def inverse_pose(T: np.ndarray) -> np.ndarray:
    """Closed-form SE(3) inverse (reference :58-76). Works batched (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = np.swapaxes(R, -1, -2)
    out = np.zeros_like(T)
    out[..., :3, :3] = Rt
    out[..., :3, 3] = -np.einsum("...ij,...j->...i", Rt, t)
    out[..., 3, 3] = 1.0
    return out


def compose_poses(T1: np.ndarray, T2: np.ndarray) -> np.ndarray:
    return T1 @ T2


def relative_pose(T_source: np.ndarray, T_target: np.ndarray) -> np.ndarray:
    """T_source⁻¹ @ T_target (reference :93-104)."""
    return inverse_pose(T_source) @ T_target


def transform_points(points: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Rigid transform; intensity column passes through (reference :107-133)."""
    xyz = points[:, :3]
    out_xyz = xyz @ T[:3, :3].T + T[:3, 3]
    if points.shape[1] == 3:
        return out_xyz
    if points.shape[1] == 4:
        return np.hstack([out_xyz, points[:, 3:4]])
    raise ValueError(f"Invalid point cloud shape: {points.shape}")


def euclidean_distance(T1: np.ndarray, T2: np.ndarray) -> float:
    return float(np.linalg.norm(T2[:3, 3] - T1[:3, 3]))


def euclidean_distance_batch(poses1: np.ndarray, poses2: np.ndarray) -> np.ndarray:
    """(..., 4, 4) × (..., 4, 4) → (...,) translation distances."""
    return np.linalg.norm(poses2[..., :3, 3] - poses1[..., :3, 3], axis=-1)


def rotation_angle(T1: np.ndarray, T2: np.ndarray) -> float:
    """Geodesic rotation angle (radians), from the trace (reference :152-175)."""
    R_rel = T1[:3, :3].T @ T2[:3, :3]
    cos_theta = np.clip((np.trace(R_rel) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.arccos(cos_theta))


def rotation_angle_batch(poses1: np.ndarray, poses2: np.ndarray) -> np.ndarray:
    R1 = poses1[..., :3, :3]
    R2 = poses2[..., :3, :3]
    R_rel = np.einsum("...ji,...jk->...ik", R1, R2)
    tr = np.trace(R_rel, axis1=-2, axis2=-1)
    return np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def rotation_angle_degrees(T1: np.ndarray, T2: np.ndarray) -> float:
    return float(np.degrees(rotation_angle(T1, T2)))


def _slerp(q0: np.ndarray, q1: np.ndarray, alpha: float) -> np.ndarray:
    """Quaternion SLERP [w,x,y,z] (closed form; reference :192-225 uses scipy)."""
    dot = float(np.dot(q0, q1))
    if dot < 0.0:
        q1 = -q1
        dot = -dot
    dot = min(dot, 1.0)
    if dot > 0.9995:
        q = q0 + alpha * (q1 - q0)
        return q / np.linalg.norm(q)
    theta = np.arccos(dot)
    s = np.sin(theta)
    return (np.sin((1 - alpha) * theta) * q0 + np.sin(alpha * theta) * q1) / s


def interpolate_poses(T1: np.ndarray, T2: np.ndarray, alpha: float) -> np.ndarray:
    """LERP translation + SLERP rotation (reference :192-225)."""
    t = (1 - alpha) * T1[:3, 3] + alpha * T2[:3, 3]
    q = _slerp(matrix_to_quat_wxyz(T1[:3, :3]), matrix_to_quat_wxyz(T2[:3, :3]), alpha)
    T = np.eye(4)
    T[:3, :3] = quat_wxyz_to_matrix(q)
    T[:3, 3] = t
    return T


def pose_difference(T1: np.ndarray, T2: np.ndarray) -> Tuple[float, float]:
    return euclidean_distance(T1, T2), rotation_angle(T1, T2)


def is_valid_transformation(T: np.ndarray, epsilon: float = 1e-6) -> bool:
    """SE(3) validity: shape, bottom row, orthogonality, det=+1
    (reference :245-272)."""
    if T.shape != (4, 4):
        return False
    if not np.allclose(T[3, :], [0, 0, 0, 1], atol=epsilon):
        return False
    R = T[:3, :3]
    if not np.allclose(R @ R.T, np.eye(3), atol=epsilon):
        return False
    return bool(np.isclose(np.linalg.det(R), 1.0, atol=epsilon))


def cartesian_to_spherical(points: np.ndarray) -> np.ndarray:
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    return np.stack([r, np.arctan2(y, x), np.arctan2(z, np.sqrt(x ** 2 + y ** 2))], axis=1)


def spherical_to_cartesian(spherical: np.ndarray) -> np.ndarray:
    r, az, el = spherical[:, 0], spherical[:, 1], spherical[:, 2]
    return np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], axis=1
    )


def compute_overlap(points1: np.ndarray, points2: np.ndarray, T_12: np.ndarray,
                    voxel_size: float = 0.2, max_points: int = 5000,
                    rng: np.random.Generator | None = None,
                    backend: str = "numpy") -> float:
    """Voxel-IoU overlap with downsampling (reference :323-389).

    ``T_12`` maps cloud2's frame into cloud1's frame — for the keyframe
    criterion that is ``relative_pose(pose1, pose2)``, which takes
    current-frame (cloud2) coordinates to the last keyframe's (cloud1)
    frame. DOCUMENTED DIVERGENCE: the reference applies that transform to
    cloud1 instead (pose_utils.py:353, a frame error that offsets the
    clouds by 2× the actual motion, deflating the IoU and over-selecting
    keyframes); here the frames are aligned correctly.

    Vectorized set ops: voxel coordinates packed into a single int64 key and
    intersected with ``np.intersect1d`` instead of Python sets. A seedable
    Generator replaces the reference's global ``np.random`` for determinism.

    ``backend="native"`` uses the C++ hash-grid implementation
    (native/nsc_geom.cpp) with a deterministic stride subsample instead of
    the random one — same IoU estimate, ~10× faster on large clouds.
    """
    if backend == "native":
        from neural_spectral_codec_tpu import native
        if native.available():
            # native transforms its second cloud by T_rel, same convention
            return native.voxel_overlap(points1, points2, T_12,
                                        voxel=voxel_size,
                                        max_points=max_points)
    rng = rng or np.random.default_rng(0)
    if len(points1) > max_points:
        points1 = points1[rng.choice(len(points1), max_points, replace=False)]
    if len(points2) > max_points:
        points2 = points2[rng.choice(len(points2), max_points, replace=False)]

    p2 = transform_points(points2[:, :3], T_12)

    def voxel_keys(pts: np.ndarray) -> np.ndarray:
        ok = np.isfinite(pts).all(axis=1)
        pts = np.clip(pts[ok], -1e6, 1e6)
        v = np.floor(pts / voxel_size).astype(np.int64)
        # pack 3×21-bit signed coords into one int64 key
        off = 1 << 20
        key = ((v[:, 0] + off) << 42) | ((v[:, 1] + off) << 21) | (v[:, 2] + off)
        return np.unique(key)

    k1, k2 = voxel_keys(points1[:, :3]), voxel_keys(p2)
    inter = np.intersect1d(k1, k2, assume_unique=True).size
    union = k1.size + k2.size - inter
    return inter / union if union > 0 else 0.0
