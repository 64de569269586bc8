"""Pure-numpy oracle replicating the reference encoder semantics.

Independent reimplementation of the math described in
/root/reference/src/encoding/{range_image.py, spectral_encoder.py}
(projection :129-232, interpolation :15-89, encoding :160-204), used as the
golden source for the JAX/TPU implementation's unit tests.
"""

import math

import numpy as np


def oracle_project(points, n_elev=64, n_azim=360, elev_deg=(-24.8, 2.0),
                   min_range=1.0, max_range=80.0):
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    finite = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    x, y, z = x[finite], y[finite], z[finite]
    x_sq = np.clip(x ** 2, 0, 1e10)
    y_sq = np.clip(y ** 2, 0, 1e10)
    z_sq = np.clip(z ** 2, 0, 1e10)
    rng = np.sqrt(x_sq + y_sq + z_sq)
    az = (np.arctan2(y, x) + np.pi) % (2 * np.pi)
    el = np.arctan2(z, np.sqrt(x_sq + y_sq))
    ok = (rng >= min_range) & (rng <= max_range) & np.isfinite(rng)
    rng, az, el = rng[ok], az[ok], el[ok]
    emin, emax = np.deg2rad(elev_deg[0]), np.deg2rad(elev_deg[1])
    eb = np.clip(np.floor((el - emin) / (emax - emin) * n_elev).astype(int),
                 0, n_elev - 1)
    ab = np.clip(np.floor(az / (2 * np.pi) * n_azim).astype(int), 0, n_azim - 1)
    flat = np.full(n_elev * n_azim, np.inf, dtype=np.float32)
    np.minimum.at(flat, eb * n_azim + ab, rng.astype(np.float32))
    img = flat.reshape(n_elev, n_azim)
    img[img == np.inf] = 0.0
    return img


def oracle_interpolate(img):
    out = img.copy()
    n_elev, n_azim = img.shape
    for row in range(n_elev):
        rd = out[row]
        vm = rd > 0
        if not vm.any() or vm.all():
            continue
        vi = np.where(vm)[0]
        vv = rd[vm]
        inv = np.where(~vm)[0]
        ext_i = np.concatenate([vi - n_azim, vi, vi + n_azim])
        ext_v = np.tile(vv, 3)
        out[row, inv] = np.interp(inv, ext_i, ext_v)
    for row in range(n_elev):
        if not np.any(out[row] > 0):
            for off in range(1, n_elev):
                if row - off >= 0 and np.any(out[row - off] > 0):
                    out[row] = out[row - off]
                    break
                if row + off < n_elev and np.any(out[row + off] > 0):
                    out[row] = out[row + off]
                    break
    return out


def oracle_adaptive_pool_rows(img, target):
    h = img.shape[0]
    out = np.zeros((target, img.shape[1]), dtype=img.dtype)
    for i in range(target):
        start = (i * h) // target
        end = -((-(i + 1) * h) // target)
        out[i] = img[start:end].mean(axis=0)
    return out


def oracle_encode_range_image(img, target=16, n_bins=50, alpha=2.0, eps=1e-8):
    if img.shape[0] != target:
        img = oracle_adaptive_pool_rows(img, target)
    n_azim = img.shape[1]
    n_freqs = n_azim // 2 + 1
    mags = np.abs(np.fft.rfft(img, axis=1, norm="ortho")) * math.sqrt(n_azim)
    # Edges in float32, mirroring the torch reference's on-device fp32 math
    # (spectral_encoder.py:107-116); fp64 edges can flip a frequency across
    # a bin boundary relative to every fp32 implementation.
    t = np.linspace(0, 1, n_bins + 1, dtype=np.float32)
    alpha32 = np.float32(alpha)
    edges = (np.exp(alpha32 * t) - 1) / (np.exp(alpha32) - np.float32(1) + np.float32(eps)) * np.float32(n_freqs)
    freqs = np.arange(n_freqs, dtype=np.float32)
    assign = np.clip(np.searchsorted(edges, freqs, side="right") - 1, 0, n_bins - 1)
    hist = np.zeros((img.shape[0], n_bins))
    for e in range(img.shape[0]):
        np.add.at(hist[e], assign, mags[e])
    hist = hist.flatten()
    s = hist.sum()
    if s > eps:
        return hist / (s + eps)
    return np.ones_like(hist) / hist.size


def oracle_wasserstein_batch(q, db, eps=1e-8):
    qs = q.sum()
    if qs > eps:
        q = q / qs
    ds = db.sum(axis=1, keepdims=True)
    db = np.where(ds > eps, db / (ds + eps), db)
    qc = np.cumsum(q)
    dc = np.cumsum(db, axis=1)
    return np.abs(dc - qc[None, :]).sum(axis=1)
