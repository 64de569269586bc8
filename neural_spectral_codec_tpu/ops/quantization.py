"""Descriptor quantization + 220-byte binary codec.

Reference: /root/reference/src/encoding/quantization.py.

  * ``quantize`` / ``dequantize``: uint16 quantization with exact-sum error
    redistribution into the largest bin (:131-192). Provided both as a
    batched JAX kernel (device-side, vmappable) and a numpy host variant.
  * ``CompressedDescriptor``: the 220-byte record — 50×uint16 histogram
    (100 B) + 7-DoF pose (28 B) + float64 timestamp (8 B) + uint32 id (4 B)
    + 20 B SHA-1 of the xyz coordinates + 60 B reserved (:22-109).
  * For the 800-D per-elevation descriptor the same layout generalizes to
    an extended record (1600 B histogram + 120 B metadata = 1720 B); the
    record length is self-describing via ``record_size(n_bins)``.

Rounding note: the reference uses ``np.round`` (round-half-to-even);
``jnp.round`` matches.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_U16 = 65535
METADATA_BYTES = 120  # pose 28 + ts 8 + id 4 + hash 20 + reserved 60


def record_size(n_bins: int = 50) -> int:
    """Total serialized bytes for an ``n_bins`` descriptor (220 for 50)."""
    return 2 * n_bins + METADATA_BYTES


@jax.jit
def quantize(histogram: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Normalized histogram (..., n) → uint16 with sum forced to 65535.

    Matches reference quantization.py:131-168: normalize, round to uint16,
    then add the rounding error to the argmax bin.
    """
    s = jnp.sum(histogram, axis=-1, keepdims=True)
    h = jnp.where(s > epsilon, histogram / (s + epsilon), histogram)
    q = jnp.round(h * MAX_U16).astype(jnp.int32)
    qsum = jnp.sum(q, axis=-1, keepdims=True)
    err = MAX_U16 - qsum
    max_idx = jnp.argmax(q, axis=-1, keepdims=True)
    corrected = jnp.clip(jnp.take_along_axis(q, max_idx, axis=-1) + err, 0, MAX_U16)
    # only apply correction when quantized sum > 0 (reference guard :155)
    corrected = jnp.where(qsum > 0, corrected, jnp.take_along_axis(q, max_idx, axis=-1))
    q = jnp.where(qsum > 0,
                  jnp.where(
                      jnp.arange(q.shape[-1]) == max_idx, corrected, q),
                  q)
    return q.astype(jnp.uint16)


@jax.jit
def dequantize(quantized: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """uint16 → normalized float32 with uniform fallback
    (reference quantization.py:170-192)."""
    h = quantized.astype(jnp.float32)
    s = jnp.sum(h, axis=-1, keepdims=True)
    uniform = jnp.ones_like(h) / h.shape[-1]
    return jnp.where(s > epsilon, h / (s + epsilon), uniform)


class HistogramQuantizer:
    """Class-style surface over :func:`quantize` / :func:`dequantize`
    (reference quantization.py:112-192 ships this API; the functional
    kernels above are the batched device implementations)."""

    def __init__(self, n_bins: int = 50, epsilon: float = 1e-8):
        self.n_bins = n_bins
        self.epsilon = epsilon

    def quantize(self, histogram: np.ndarray) -> np.ndarray:
        h = np.asarray(histogram, np.float32)
        if h.shape[-1] != self.n_bins:
            raise ValueError(
                f"expected {self.n_bins}-bin histogram, got {h.shape[-1]}")
        return np.asarray(quantize(jnp.asarray(h), self.epsilon))

    def dequantize(self, quantized: np.ndarray) -> np.ndarray:
        q = np.asarray(quantized, np.uint16)
        if q.shape[-1] != self.n_bins:
            raise ValueError(
                f"expected {self.n_bins}-bin histogram, got {q.shape[-1]}")
        return np.asarray(dequantize(jnp.asarray(q), self.epsilon))


# ---------------------------------------------------------------------------
# SE(3) ↔ 7-DoF (host numpy; closed-form quaternion, no scipy dependency on
# the hot path). Reference quantization.py:215-284 uses scipy Rotation.
# ---------------------------------------------------------------------------

def matrix_to_quat_wxyz(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → unit quaternion [w, x, y, z] (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z], dtype=np.float64)
    # canonicalize sign like scipy (w >= 0)
    if q[0] < 0:
        q = -q
    return q


def quat_wxyz_to_matrix(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def pose_to_7dof(pose: np.ndarray) -> np.ndarray:
    """(4,4) SE(3) → [x, y, z, qw, qx, qy, qz] (reference :215-246)."""
    q = matrix_to_quat_wxyz(pose[:3, :3])
    return np.concatenate([pose[:3, 3], q])


def pose_from_7dof(p7: np.ndarray) -> np.ndarray:
    """[x, y, z, qw, qx, qy, qz] → (4,4) SE(3) (reference :249-284)."""
    T = np.eye(4)
    T[:3, :3] = quat_wxyz_to_matrix(np.asarray(p7[3:], dtype=np.float64))
    T[:3, 3] = p7[:3]
    return T


def compute_point_cloud_hash(points: np.ndarray) -> bytes:
    """SHA-1 of the float32 xyz bytes (reference :195-212)."""
    return hashlib.sha1(points[:, :3].astype(np.float32).tobytes()).digest()


@dataclass
class CompressedDescriptor:
    """Binary keyframe record (reference :22-109; 220 B for 50 bins)."""

    histogram: np.ndarray  # (n_bins,) uint16
    pose: np.ndarray  # (7,) float32 [x, y, z, qw, qx, qy, qz]
    timestamp: float
    keyframe_id: int
    point_cloud_hash: bytes  # 20 bytes

    def to_bytes(self) -> bytes:
        n_bins = len(self.histogram)
        out = (
            self.histogram.astype(np.uint16).tobytes()
            + self.pose.astype(np.float32).tobytes()
            + struct.pack("d", self.timestamp)
            + struct.pack("I", self.keyframe_id)
            + self.point_cloud_hash
            + bytes(60)
        )
        assert len(out) == record_size(n_bins), len(out)
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "CompressedDescriptor":
        n_bins = (len(data) - METADATA_BYTES) // 2
        h_end = 2 * n_bins
        return CompressedDescriptor(
            histogram=np.frombuffer(data[:h_end], dtype=np.uint16).copy(),
            pose=np.frombuffer(data[h_end:h_end + 28], dtype=np.float32).copy(),
            timestamp=struct.unpack("d", data[h_end + 28:h_end + 36])[0],
            keyframe_id=struct.unpack("I", data[h_end + 36:h_end + 40])[0],
            point_cloud_hash=data[h_end + 40:h_end + 60],
        )


def compress_descriptor(histogram: np.ndarray, pose: np.ndarray,
                        timestamp: float, keyframe_id: int,
                        points: np.ndarray) -> CompressedDescriptor:
    """Full compression path (reference :287-327)."""
    q = np.asarray(quantize(jnp.asarray(histogram, jnp.float32)))
    return CompressedDescriptor(
        histogram=q,
        pose=pose_to_7dof(pose).astype(np.float32),
        timestamp=timestamp,
        keyframe_id=keyframe_id,
        point_cloud_hash=compute_point_cloud_hash(points),
    )


def decompress_descriptor(desc: CompressedDescriptor):
    """→ (histogram float32, pose (4,4), timestamp, keyframe_id)
    (reference :330-353)."""
    h = np.asarray(dequantize(jnp.asarray(desc.histogram)))
    return h, pose_from_7dof(desc.pose.astype(np.float64)), desc.timestamp, desc.keyframe_id


class DescriptorDatabaseFile:
    """Append-only flat binary store of fixed-size descriptor records —
    the persistent artifact format (configs/inference.yaml:27-31 in the
    reference describes it; never implemented there)."""

    def __init__(self, path: str, n_bins: int = 50):
        self.path = path
        self.n_bins = n_bins
        self.rec = record_size(n_bins)

    def append(self, desc: CompressedDescriptor) -> None:
        with open(self.path, "ab") as f:
            f.write(desc.to_bytes())

    def read_all(self):
        try:
            with open(self.path, "rb") as f:
                data = f.read()
        except FileNotFoundError:
            return []
        n = len(data) // self.rec
        return [
            CompressedDescriptor.from_bytes(data[i * self.rec:(i + 1) * self.rec])
            for i in range(n)
        ]
