"""ctypes bindings for the native geometry library (native/nsc_geom.cpp).

The library is built on demand with g++ the first time it is requested
(no pybind11 in this toolchain — plain C ABI + ctypes). All entry points
have pure JAX/numpy fallbacks in retrieval/verification.py and
data/pose_utils.py; ``available()`` reports whether the native path is
usable so callers can select a backend explicitly or automatically.
"""

from __future__ import annotations

import ctypes
import logging
from typing import Optional, Tuple

import numpy as np

from neural_spectral_codec_tpu.native._build import load_library

logger = logging.getLogger(__name__)

_f32p = ctypes.POINTER(ctypes.c_float)


def _configure(lib: ctypes.CDLL) -> None:
    lib.nsc_voxel_downsample.restype = ctypes.c_int
    lib.nsc_voxel_downsample.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_float, _f32p, ctypes.c_int]
    lib.nsc_estimate_normals.restype = None
    lib.nsc_estimate_normals.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, _f32p]
    lib.nsc_estimate_covariances.restype = None
    lib.nsc_estimate_covariances.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, _f32p]
    lib.nsc_icp.restype = None
    lib.nsc_icp.argtypes = [
        _f32p, ctypes.c_int, _f32p, ctypes.c_int, _f32p, _f32p,
        ctypes.c_int, ctypes.c_float, _f32p, _f32p, _f32p]
    lib.nsc_gicp.restype = None
    lib.nsc_gicp.argtypes = [
        _f32p, ctypes.c_int, _f32p, _f32p, ctypes.c_int, _f32p,
        _f32p, ctypes.c_int, ctypes.c_float, _f32p, _f32p, _f32p]
    lib.nsc_voxel_overlap.restype = ctypes.c_float
    lib.nsc_voxel_overlap.argtypes = [
        _f32p, ctypes.c_int, _f32p, ctypes.c_int, _f32p,
        ctypes.c_float, ctypes.c_int]


def _load() -> Optional[ctypes.CDLL]:
    return load_library("libnsc_geom.so", _configure)


def available() -> bool:
    return _load() is not None


def _c3(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a[:, :3], dtype=np.float32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = _c3(points)
    out = np.empty_like(pts)
    m = lib.nsc_voxel_downsample(_ptr(pts), len(pts), voxel, _ptr(out),
                                 len(out))
    return out[:m].copy()


def estimate_normals(points: np.ndarray, k: int = 16,
                     grid_cell: float = 0.6) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = _c3(points)
    out = np.empty_like(pts)
    lib.nsc_estimate_normals(_ptr(pts), len(pts), k, grid_cell, _ptr(out))
    return out


def icp(src: np.ndarray, dst: np.ndarray,
        normals: Optional[np.ndarray] = None,
        init: Optional[np.ndarray] = None, max_iterations: int = 30,
        max_correspondence: float = 1.0
        ) -> Tuple[np.ndarray, float, float]:
    """Returns (T (4,4), fitness, inlier_rmse)."""
    lib = _load()
    assert lib is not None
    s, d = _c3(src), _c3(dst)
    nrm = (np.ascontiguousarray(normals, np.float32)
           if normals is not None else None)
    T0 = np.ascontiguousarray(
        init if init is not None else np.eye(4), np.float32)
    T_out = np.empty(16, np.float32)
    fit = ctypes.c_float()
    rmse = ctypes.c_float()
    lib.nsc_icp(_ptr(s), len(s), _ptr(d), len(d),
                _ptr(nrm) if nrm is not None else None,
                _ptr(T0), max_iterations, max_correspondence,
                _ptr(T_out), ctypes.byref(fit), ctypes.byref(rmse))
    return T_out.reshape(4, 4).astype(np.float64), fit.value, rmse.value


def estimate_covariances(points: np.ndarray, k: int = 20,
                         grid_cell: float = 0.6,
                         eps: float = 1e-3) -> np.ndarray:
    """GICP disk-regularized per-point covariances, (n, 3, 3)."""
    lib = _load()
    assert lib is not None
    pts = _c3(points)
    out = np.empty((len(pts), 3, 3), np.float32)
    lib.nsc_estimate_covariances(_ptr(pts), len(pts), k, grid_cell, eps,
                                 _ptr(out))
    return out


def gicp(src: np.ndarray, dst: np.ndarray, cov_src: np.ndarray,
         cov_dst: np.ndarray, init: Optional[np.ndarray] = None,
         max_iterations: int = 30, max_correspondence: float = 1.0
         ) -> Tuple[np.ndarray, float, float]:
    """Generalized ICP (covariance-weighted Gauss-Newton).

    Returns (T (4,4), fitness, inlier_rmse) with the same point-point
    inlier statistics as :func:`icp`."""
    lib = _load()
    assert lib is not None
    s, d = _c3(src), _c3(dst)
    cs = np.ascontiguousarray(cov_src, np.float32)
    cd = np.ascontiguousarray(cov_dst, np.float32)
    T0 = np.ascontiguousarray(
        init if init is not None else np.eye(4), np.float32)
    T_out = np.empty(16, np.float32)
    fit = ctypes.c_float()
    rmse = ctypes.c_float()
    lib.nsc_gicp(_ptr(s), len(s), _ptr(cs), _ptr(d), len(d), _ptr(cd),
                 _ptr(T0), max_iterations, max_correspondence,
                 _ptr(T_out), ctypes.byref(fit), ctypes.byref(rmse))
    return T_out.reshape(4, 4).astype(np.float64), fit.value, rmse.value


def voxel_overlap(points1: np.ndarray, points2: np.ndarray,
                  T_rel: np.ndarray, voxel: float = 0.2,
                  max_points: int = 5000) -> float:
    lib = _load()
    assert lib is not None
    p1, p2 = _c3(points1), _c3(points2)
    T = np.ascontiguousarray(T_rel, np.float32)
    return float(lib.nsc_voxel_overlap(_ptr(p1), len(p1), _ptr(p2), len(p2),
                                       _ptr(T), voxel, max_points))
