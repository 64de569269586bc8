"""Geometric verification of loop-closure candidates.

Reference behavior (/root/reference/src/retrieval/geometric_verification.py):
Open3D GICP with 0.3 m voxel downsample, 1.0 m correspondence distance, 30
iterations; accept iff fitness ≥ 0.3 ∧ inlier-RMSE ≤ 0.5 m; heuristic
diagonal (6,6) information matrix scaled by fitness (:165-203).

TPU-native redesign: registration runs as a fixed-shape JAX program —
padded point sets, all-pairs nearest-neighbor via a distance matrix (the
downsampled clouds are ≤4096 points, so the (P,Q) matrix is small for the
MXU), and a `lax.fori_loop` over ICP iterations:

  * ``method="icp"``  — point-to-point via weighted Kabsch (SVD) per step.
  * ``method="point_to_plane"`` — k-NN PCA normals on the target +
    point-to-plane Gauss-Newton steps.
  * ``method="gicp"`` — true generalized ICP (Segal et al. 2009, the
    formulation behind Open3D's ``registration_generalized_icp``): per-point
    disk-regularized covariances ``C = V diag(1,1,ε) Vᵀ`` from k-NN PCA on
    BOTH clouds, Gauss-Newton on the Mahalanobis residual
    ``rᵀ (C_q + R C_p Rᵀ)⁻¹ r``.

Accept thresholds, fitness (inlier fraction of source points), RMSE, and
the information-matrix heuristic match the reference contract.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Mean of points per voxel (Open3D ``voxel_down_sample`` semantics)."""
    pts = points[:, :3]
    ok = np.isfinite(pts).all(axis=1)
    pts = pts[ok]
    if len(pts) == 0 or voxel_size <= 0:
        return pts
    v = np.floor(pts / voxel_size).astype(np.int64)
    off = 1 << 20
    key = ((v[:, 0] + off) << 42) | ((v[:, 1] + off) << 21) | (v[:, 2] + off)
    order = np.argsort(key)
    key, pts = key[order], pts[order]
    uniq, start, counts = np.unique(key, return_index=True, return_counts=True)
    sums = np.add.reduceat(pts, start, axis=0)
    return (sums / counts[:, None]).astype(np.float32)


def _pad(points: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    out = np.zeros((n, 3), np.float32)
    m = np.zeros(n, bool)
    k = min(len(points), n)
    if k:
        # deterministic stride subsample when oversized
        sel = np.linspace(0, len(points) - 1, k).astype(int) if len(points) > n \
            else np.arange(k)
        out[:k] = points[sel, :3]
        m[:k] = True
    return out, m


def _knn_cov_matrices(pts: jnp.ndarray, mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Raw k-NN PCA covariance per point, (P, 3, 3)."""
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, k)          # (P, k) nearest incl. self
    nbr = pts[idx]                          # (P, k, 3)
    mean = jnp.mean(nbr, axis=1, keepdims=True)
    c = nbr - mean
    return jnp.einsum("pki,pkj->pij", c, c) / k


@functools.partial(jax.jit, static_argnums=(2,))
def _knn_normals(pts: jnp.ndarray, mask: jnp.ndarray, k: int = 16) -> jnp.ndarray:
    """Unit normals per point from k-NN PCA (smallest eigenvector)."""
    cov = _knn_cov_matrices(pts, mask, k)
    _, vecs = jnp.linalg.eigh(cov)          # ascending eigenvalues
    return vecs[:, :, 0]                    # smallest-eigenvalue direction


@functools.partial(jax.jit, static_argnums=(2,))
def _knn_covariances(pts: jnp.ndarray, mask: jnp.ndarray, k: int = 20,
                     eps: float = 1e-3) -> jnp.ndarray:
    """GICP disk-regularized covariances: eigenvalues → (ε, 1, 1).

    Matches Open3D's TransformationEstimationForGeneralizedICP covariance
    model (reference geometric_verification.py:96-117): the local normal
    direction is squashed to ε, the in-surface directions to 1."""
    cov = _knn_cov_matrices(pts, mask, k)
    _, vecs = jnp.linalg.eigh(cov)          # ascending eigenvalues
    d = jnp.array([eps, 1.0, 1.0], cov.dtype)
    return jnp.einsum("pij,j,pkj->pik", vecs, d, vecs)


def _transform(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


def _se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Small-angle SE(3) exponential for Gauss-Newton updates; xi=[ω, t]."""
    w, t = xi[:3], xi[3:]
    th = jnp.linalg.norm(w) + 1e-12
    K = jnp.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R = (jnp.eye(3) + jnp.sin(th) / th * K
         + (1 - jnp.cos(th)) / (th * th) * (K @ K))
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@functools.partial(jax.jit, static_argnums=(8, 9))
def _icp_kernel(src, src_mask, dst, dst_mask, normals, cov_src, cov_dst,
                init_T, max_iterations: int, mode: str,
                max_corr: float = 1.0):
    """Fixed-shape ICP. mode ∈ {"p2p", "p2l", "gicp"}.
    Returns (T, fitness, inlier_rmse)."""
    n_src = jnp.maximum(jnp.sum(src_mask), 1)

    def correspondences(T):
        moved = _transform(T, src)
        d2 = jnp.sum((moved[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(dst_mask[None, :], d2, jnp.inf)
        j = jnp.argmin(d2, axis=1)
        dist = jnp.sqrt(jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0])
        w = src_mask & (dist <= max_corr)
        return moved, j, dist, w.astype(jnp.float32)

    def p2p_step(T):
        moved, j, dist, w = correspondences(T)
        q = dst[j]
        sw = jnp.maximum(jnp.sum(w), 1e-6)
        # weighted Kabsch from ORIGINAL src to matched targets
        p_c = jnp.sum(src * w[:, None], 0) / sw
        q_c = jnp.sum(q * w[:, None], 0) / sw
        H = jnp.einsum("ni,nj->ij", (src - p_c) * w[:, None], q - q_c)
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
        R = Vt.T @ D @ U.T
        t = q_c - R @ p_c
        Tn = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
        return Tn

    def p2l_step(T):
        moved, j, dist, w = correspondences(T)
        q, n = dst[j], normals[j]
        r = jnp.sum((moved - q) * n, axis=1)          # signed plane residual
        J = jnp.concatenate([jnp.cross(moved, n), n], axis=1)  # (P, 6)
        Jw = J * w[:, None]
        A = Jw.T @ J + 1e-6 * jnp.eye(6)
        b = -Jw.T @ r
        xi = jnp.linalg.solve(A, b)
        return _se3_exp(xi) @ T

    def gicp_step(T):
        """Gauss-Newton on the GICP Mahalanobis residual
        rᵀ (C_q + R C_p Rᵀ)⁻¹ r (Segal et al. 2009 / Open3D
        registration_generalized_icp)."""
        moved, j, dist, w = correspondences(T)
        q = dst[j]
        R = T[:3, :3]
        Cs = jnp.einsum("ab,pbc,dc->pad", R, cov_src, R)
        S = cov_dst[j] + Cs + 1e-9 * jnp.eye(3)
        M = jnp.linalg.inv(S)                         # (P, 3, 3)
        r = moved - q                                 # (P, 3)
        x, y, z = moved[:, 0], moved[:, 1], moved[:, 2]
        zero = jnp.zeros_like(x)
        # J = [ -[moved]ₓ | I ] per point, (P, 3, 6)
        Jr = jnp.stack([
            jnp.stack([zero, z, -y], axis=-1),
            jnp.stack([-z, zero, x], axis=-1),
            jnp.stack([y, -x, zero], axis=-1)], axis=1)
        I3 = jnp.broadcast_to(jnp.eye(3), Jr.shape)
        J = jnp.concatenate([Jr, I3], axis=2)         # (P, 3, 6)
        MJ = jnp.einsum("pij,pjb->pib", M, J)
        A = jnp.einsum("p,pia,pib->ab", w, J, MJ) + 1e-9 * jnp.eye(6)
        b = -jnp.einsum("p,pib,pi->b", w, MJ, r)
        xi = jnp.linalg.solve(A, b)
        return _se3_exp(xi) @ T

    step = {"p2p": p2p_step, "p2l": p2l_step, "gicp": gicp_step}[mode]
    T = jax.lax.fori_loop(0, max_iterations, lambda _, T: step(T), init_T)

    _, _, dist, w = correspondences(T)
    inliers = jnp.sum(w)
    fitness = inliers / n_src
    rmse = jnp.sqrt(jnp.sum(w * dist ** 2) / jnp.maximum(inliers, 1e-6))
    return T, fitness, rmse


class PreparedCloud:
    """Per-cloud verification precomputation: downsampled points plus the
    method-specific auxiliaries (GICP covariances / point-to-plane
    normals). Keyframe clouds are immutable, so preparing once and reusing
    across every candidate pairing removes the dominant cost of repeated
    verification (~2/3 of verify() is covariance estimation)."""

    __slots__ = ("pts", "cov", "normals", "padded", "mask")

    def __init__(self, pts, cov=None, normals=None, padded=None, mask=None):
        self.pts = pts
        self.cov = cov
        self.normals = normals
        self.padded = padded        # JAX backend: fixed-shape pad
        self.mask = mask


class GeometricVerifier:
    """Loop-closure verifier (reference geometric_verification.py:16-203
    contract: verify() → (verified, transform|None, info dict)).

    ``prepare()`` returns a :class:`PreparedCloud` that ``verify()``
    accepts in place of raw points on either side, skipping the
    downsample + covariance/normal work for clouds verified repeatedly
    (the retrieval layer caches these per keyframe)."""

    def __init__(self, method: str = "gicp", fitness_threshold: float = 0.3,
                 rmse_threshold: float = 0.5, max_iterations: int = 30,
                 voxel_downsample: float = 0.3,
                 max_correspondence_distance: float = 1.0,
                 max_points: int = 4096, backend: str = "auto",
                 gicp_epsilon: float = 1e-3, covariance_knn: int = 20):
        if method not in ("icp", "point_to_plane", "gicp"):
            raise ValueError(f"unknown verification method: {method}")
        self.method = method
        self.gicp_epsilon = gicp_epsilon
        self.covariance_knn = covariance_knn
        self.fitness_threshold = fitness_threshold
        self.rmse_threshold = rmse_threshold
        self.max_iterations = max_iterations
        self.voxel_downsample = voxel_downsample
        self.max_correspondence_distance = max_correspondence_distance
        self.max_points = max_points
        if backend == "auto":
            from neural_spectral_codec_tpu import native
            backend = "native" if native.available() else "jax"
        if backend not in ("native", "jax"):
            raise ValueError(f"unknown verifier backend: {backend}")
        self.backend = backend

    def prepare(self, points: np.ndarray) -> PreparedCloud:
        """Precompute the per-cloud verification state (downsample +
        GICP covariances / p2l normals) so repeated ``verify()`` calls
        against the same cloud skip its dominant cost."""
        if self.backend == "native":
            from neural_spectral_codec_tpu import native
            pts = native.voxel_downsample(points, self.voxel_downsample)
            if len(pts) > self.max_points:
                pts = pts[np.linspace(0, len(pts) - 1,
                                      self.max_points).astype(int)]
            cov = normals = None
            if len(pts) >= 6:
                cell = 2 * self.voxel_downsample
                if self.method == "gicp":
                    cov = native.estimate_covariances(
                        pts, k=self.covariance_knn, grid_cell=cell,
                        eps=self.gicp_epsilon)
                elif self.method == "point_to_plane":
                    normals = native.estimate_normals(pts, k=16,
                                                      grid_cell=cell)
            return PreparedCloud(pts, cov=cov, normals=normals)

        pts = voxel_downsample(points, self.voxel_downsample)
        padded, mask = _pad(pts, self.max_points)
        p, m = jnp.asarray(padded), jnp.asarray(mask)
        cov = normals = None
        if self.method == "gicp":
            cov = _knn_covariances(p, m, self.covariance_knn,
                                   self.gicp_epsilon)
        elif self.method == "point_to_plane":
            normals = _knn_normals(p, m)
        return PreparedCloud(pts, cov=cov, normals=normals,
                             padded=p, mask=m)

    def _prep(self, points_or_prepared) -> PreparedCloud:
        if isinstance(points_or_prepared, PreparedCloud):
            return points_or_prepared
        return self.prepare(points_or_prepared)

    def verify(self, source_points, target_points,
               initial_transform: Optional[np.ndarray] = None
               ) -> Tuple[bool, Optional[np.ndarray], Dict]:
        """Either side may be raw (N, 3|4) points or a
        :class:`PreparedCloud` from :meth:`prepare`."""
        if self.backend == "native":
            return self._verify_native(source_points, target_points,
                                       initial_transform)
        return self._verify_jax(source_points, target_points,
                                initial_transform)

    def _verify_native(self, source_points, target_points, initial_transform):
        """Host C++ path (native/nsc_geom.cpp): grid-accelerated
        correspondences instead of the O(n²) brute force the fixed-shape
        JAX kernel pays — the idiomatic split for this irregular CPU-side
        workload (SURVEY §2.2)."""
        from neural_spectral_codec_tpu import native
        sprep = self._prep(source_points)
        dprep = self._prep(target_points)
        src, dst = sprep.pts, dprep.pts
        if len(src) < 6 or len(dst) < 6:
            info = {"fitness": 0.0, "rmse": float("inf"),
                    "information_matrix": self._information_matrix(0.0)}
            return False, None, info
        if self.method == "gicp":
            T, fitness, rmse = native.gicp(
                src, dst, sprep.cov, dprep.cov, init=initial_transform,
                max_iterations=self.max_iterations,
                max_correspondence=self.max_correspondence_distance)
        else:
            T, fitness, rmse = native.icp(
                src, dst, normals=dprep.normals, init=initial_transform,
                max_iterations=self.max_iterations,
                max_correspondence=self.max_correspondence_distance)
        info = {"fitness": fitness, "rmse": rmse,
                "information_matrix": self._information_matrix(fitness)}
        verified = (fitness >= self.fitness_threshold
                    and rmse <= self.rmse_threshold)
        return (True, T, info) if verified else (False, None, info)

    def _verify_jax(self, source_points, target_points,
                    initial_transform: Optional[np.ndarray] = None
                    ) -> Tuple[bool, Optional[np.ndarray], Dict]:
        sprep = self._prep(source_points)
        dprep = self._prep(target_points)
        init = np.eye(4, dtype=np.float32) if initial_transform is None \
            else np.asarray(initial_transform, np.float32)

        mode = {"icp": "p2p", "point_to_plane": "p2l",
                "gicp": "gicp"}[self.method]
        sp, sm = sprep.padded, sprep.mask
        dp, dm = dprep.padded, dprep.mask
        normals = dprep.normals if mode == "p2l" else jnp.zeros_like(dp)
        zc = jnp.zeros((self.max_points, 3, 3), jnp.float32)
        cov_s = sprep.cov if mode == "gicp" else zc
        cov_d = dprep.cov if mode == "gicp" else zc
        T, fitness, rmse = _icp_kernel(
            sp, sm, dp, dm, normals, cov_s, cov_d, jnp.asarray(init),
            self.max_iterations, mode, self.max_correspondence_distance)
        T = np.asarray(T, np.float64)
        fitness = float(fitness)
        rmse = float(rmse)
        info = {
            "fitness": fitness,
            "rmse": rmse,
            "information_matrix": self._information_matrix(fitness),
        }
        verified = (fitness >= self.fitness_threshold) and (rmse <= self.rmse_threshold)
        return (True, T, info) if verified else (False, None, info)

    @staticmethod
    def _information_matrix(fitness: float) -> np.ndarray:
        """Diagonal heuristic scaled by fitness
        (reference geometric_verification.py:165-203): 100 for translation,
        1000 for rotation."""
        info = np.eye(6)
        info[:3, :3] *= 100.0 * fitness
        info[3:, 3:] *= 1000.0 * fitness
        return info


def verify_loop_closure(source_points, target_points, method: str = "gicp",
                        fitness_threshold: float = 0.3,
                        rmse_threshold: float = 0.5):
    """Convenience wrapper (reference :206-234)."""
    return GeometricVerifier(
        method=method, fitness_threshold=fitness_threshold,
        rmse_threshold=rmse_threshold).verify(source_points, target_points)


def batch_verify_candidates(query_points, candidate_points_list,
                            method: str = "gicp",
                            fitness_threshold: float = 0.3,
                            rmse_threshold: float = 0.5,
                            parallel: bool = False,
                            max_workers: int = 4) -> list:
    """Verify many candidates (reference :237-271).

    ``parallel`` actually works here (the reference's flag was a no-op):
    the native C++ ICP releases the GIL through ctypes, so a thread pool
    verifies candidates concurrently on host cores. Results keep the
    input order."""
    v = GeometricVerifier(method=method, fitness_threshold=fitness_threshold,
                          rmse_threshold=rmse_threshold)
    qprep = v.prepare(query_points)   # shared across all pairings
    if parallel and v.backend == "native" and len(candidate_points_list) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            return list(pool.map(lambda c: v.verify(qprep, c),
                                 candidate_points_list))
    return [v.verify(qprep, c) for c in candidate_points_list]
