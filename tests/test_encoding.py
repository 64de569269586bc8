"""Golden tests: JAX encoding ops vs the numpy oracle, plus property tests
(rotation invariance, normalization) mirroring the reference's self-checks
(spectral_encoder.py:365-415)."""

import numpy as np
import jax.numpy as jnp
import pytest

from neural_spectral_codec_tpu.ops import (
    project_points,
    project_points_batch,
    interpolate_range_image,
    encode_range_image,
    encode_points_batch,
    SpectralEncoderConfig,
)
from neural_spectral_codec_tpu.ops.range_image import ProjectionConfig, pad_points
from neural_spectral_codec_tpu.ops.spectral import (
    pooling_matrix,
    binning_matrix,
    encode_range_image_numpy_50d,
)

from oracle import (
    oracle_project,
    oracle_interpolate,
    oracle_adaptive_pool_rows,
    oracle_encode_range_image,
)

CFG = SpectralEncoderConfig()
PROJ = ProjectionConfig()


def test_projection_matches_oracle(scan):
    ref = oracle_project(scan)
    got = np.asarray(project_points(jnp.asarray(scan), PROJ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_projection_padding_invariant(scan):
    """NaN padding must not change the projection."""
    padded = pad_points(scan, len(scan) + 4096)
    a = np.asarray(project_points(jnp.asarray(scan), PROJ))
    b = np.asarray(project_points(jnp.asarray(padded), PROJ))
    np.testing.assert_array_equal(a, b)


def test_interpolation_matches_oracle(scan):
    img = oracle_project(scan, n_elev=16)
    # Punch extra holes to exercise wrap-around interpolation.
    img[3, 100:200] = 0.0
    img[5, :] = 0.0  # fully empty row
    img[0, :10] = 0.0
    img[0, -10:] = 0.0
    ref = oracle_interpolate(img)
    got = np.asarray(interpolate_range_image(jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_interpolation_leading_empty_rows():
    img = np.zeros((6, 16), dtype=np.float32)
    img[3] = 2.0
    img[5] = 7.0
    ref = oracle_interpolate(img)
    got = np.asarray(interpolate_range_image(jnp.asarray(img)))
    np.testing.assert_allclose(got, ref)


def test_interpolation_single_valid_pixel():
    img = np.zeros((2, 12), dtype=np.float32)
    img[0, 5] = 3.0
    ref = oracle_interpolate(img)
    got = np.asarray(interpolate_range_image(jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_pooling_matrix_matches_adaptive_pool(rng):
    img = rng.uniform(0, 10, (64, 360)).astype(np.float32)
    ref = oracle_adaptive_pool_rows(img, 16)
    got = pooling_matrix(64, 16) @ img
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # non-divisible case (NCLT 32 rings → 12 target, say)
    img2 = rng.uniform(0, 10, (32, 60)).astype(np.float32)
    ref2 = oracle_adaptive_pool_rows(img2, 12)
    got2 = pooling_matrix(32, 12) @ img2
    np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("alpha", [0.5, 2.0, 4.0])
def test_binning_matrix_edges(alpha):
    Bm = np.asarray(binning_matrix(jnp.float32(alpha), 50, 181))
    assert Bm.shape == (181, 50)
    # each frequency assigned to exactly one bin
    np.testing.assert_array_equal(Bm.sum(axis=1), np.ones(181))


def test_encode_range_image_matches_oracle(scan):
    img = oracle_interpolate(oracle_project(scan))
    ref = oracle_encode_range_image(img)
    got = np.asarray(encode_range_image(jnp.asarray(img), jnp.float32(2.0), CFG))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)
    assert got.shape == (800,)
    np.testing.assert_allclose(got.sum(), 1.0, atol=1e-4)


def test_encode_empty_scan_uniform_fallback():
    pts = np.full((128, 4), np.nan, dtype=np.float32)
    got = np.asarray(encode_points_batch(jnp.asarray(pts[None]), jnp.float32(2.0), CFG))[0]
    np.testing.assert_allclose(got, np.ones(800) / 800, atol=1e-6)


def test_encode_points_end_to_end_matches_oracle(scan):
    ref = oracle_encode_range_image(oracle_interpolate(oracle_project(scan)))
    padded = pad_points(scan, 32768)
    got = np.asarray(
        encode_points_batch(jnp.asarray(padded[None]), jnp.float32(2.0), CFG)
    )[0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_rotation_invariance(scan):
    """Max histogram diff across z-rotations must be small
    (reference self-check spectral_encoder.py:365-415, threshold 1e-3
    per configs/inference.yaml:98-101 — we use the azimuth-bin-aligned
    rotations for exactness plus arbitrary angles for approximate check)."""
    descs = []
    for k in range(8):
        ang = 2 * np.pi * k / 8
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
        pts = scan.copy()
        pts[:, :3] = pts[:, :3] @ R.T
        padded = pad_points(pts, 32768)
        d = np.asarray(
            encode_points_batch(jnp.asarray(padded[None]), jnp.float32(2.0), CFG)
        )[0]
        descs.append(d)
    descs = np.stack(descs)
    max_diff = np.abs(descs[None] - descs[:, None]).max()
    assert max_diff < 5e-3, max_diff


def test_numpy_50d_variant():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 50, (64, 360)).astype(np.float32)
    h = encode_range_image_numpy_50d(img)
    assert h.shape == (50,)
    np.testing.assert_allclose(h.sum(), 1.0, atol=1e-6)


def test_batch_encode_matches_single(rng):
    scans = np.stack([
        pad_points(np.asarray(rng.uniform(-40, 40, (5000, 4)), np.float32), 8192)
        for _ in range(3)
    ])
    batch = np.asarray(encode_points_batch(jnp.asarray(scans), jnp.float32(2.0), CFG))
    for i in range(3):
        single = np.asarray(
            encode_points_batch(jnp.asarray(scans[i][None]), jnp.float32(2.0), CFG)
        )[0]
        np.testing.assert_allclose(batch[i], single, rtol=1e-6, atol=1e-7)


def test_pallas_kernel_parity_interpret(rng):
    """Fused Pallas kernel (interpret mode on CPU) matches the XLA
    composition bit-for-bit-ish, including interpolation, empty rows,
    and the empty-scan uniform fallback."""
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.pallas_spectral import (
        encode_range_image_batch_pallas)
    from neural_spectral_codec_tpu.ops.range_image import interpolate_range_image
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_range_image_batch)

    cfg = SpectralEncoderConfig()
    imgs = rng.uniform(0, 80, (5, 64, 360)).astype(np.float32)
    imgs[imgs < 15] = 0.0          # empty pixels
    imgs[1, 10:14] = 0.0           # empty rows
    imgs[3] = 0.0                  # fully empty scan
    interp = jax.vmap(interpolate_range_image)(jnp.asarray(imgs))
    ref = np.asarray(encode_range_image_batch(interp, jnp.float32(2.0), cfg))
    got = np.asarray(encode_range_image_batch_pallas(
        jnp.asarray(imgs), jnp.float32(2.0), cfg, True))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    assert np.allclose(got[3], 1.0 / 800)


def test_pallas_kernel_parity_small_config(rng):
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.pallas_spectral import (
        encode_range_image_batch_pallas)
    from neural_spectral_codec_tpu.ops.range_image import interpolate_range_image
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_range_image_batch)

    cfg = SpectralEncoderConfig(n_elevation=16, n_azimuth=90, n_bins=20,
                                target_elevation_bins=8)
    imgs = rng.uniform(0, 80, (3, 16, 90)).astype(np.float32)  # pads to 8
    imgs[imgs < 20] = 0.0
    interp = jax.vmap(interpolate_range_image)(jnp.asarray(imgs))
    ref = np.asarray(encode_range_image_batch(interp, jnp.float32(2.0), cfg))
    got = np.asarray(encode_range_image_batch_pallas(
        jnp.asarray(imgs), jnp.float32(2.0), cfg, True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_project_with_intensity(rng):
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import (
        ProjectionConfig, project_points, project_points_with_intensity)
    cfg = ProjectionConfig(n_elevation=16, n_azimuth=90)
    pts = np.asarray(rng.uniform(-40, 40, (5000, 4)), np.float32)
    pts[:, 3] = rng.uniform(0, 1, 5000)
    img, iimg = [np.asarray(a) for a in
                 project_points_with_intensity(jnp.asarray(pts), cfg)]
    ref = np.asarray(project_points(jnp.asarray(pts), cfg))
    np.testing.assert_array_equal(img, ref)  # ranges identical
    # intensity present exactly where range present, and each intensity
    # value belongs to some point in that pixel
    assert ((iimg > 0) <= (img > 0)).all()
    # for a few pixels, intensity equals intensity of the closest point
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    az = np.mod(np.arctan2(y, x) + np.pi, 2 * np.pi)
    el = np.arctan2(z, np.sqrt(x * x + y * y))
    ok = (r >= cfg.min_range) & (r <= cfg.max_range)
    eb = np.clip(((el - cfg.elevation_min) / (cfg.elevation_max - cfg.elevation_min)
                  * 16).astype(int), 0, 15)
    ab = np.clip((az / (2 * np.pi) * 90).astype(int), 0, 89)
    checked = 0
    for e, a in [(4, 10), (8, 45), (12, 80), (2, 3)]:
        sel = ok & (eb == e) & (ab == a)
        if not sel.any():
            continue
        j = np.nonzero(sel)[0][np.argmin(r[sel])]
        assert abs(iimg[e, a] - pts[j, 3]) < 1e-6
        checked += 1
    assert checked > 0


def test_intensity_exact_tie_max(rng):
    """Exact-range ties take the MAX intensity, floored at 0 — the
    reference's np.maximum.at semantics over its closest-point mask
    (range_image.py:217-230). Engineered duplicate points with identical
    ranges and differing intensities."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import (
        ProjectionConfig, project_points_with_intensity)
    cfg = ProjectionConfig(n_elevation=16, n_azimuth=90)
    base = np.asarray(rng.uniform(-40, 40, (512, 4)), np.float32)
    # duplicate every point 3x with identical xyz (exact range ties) and
    # random intensities, including negatives to exercise the zero floor
    pts = np.concatenate([base, base, base])
    pts[:, 3] = rng.uniform(-0.5, 1.0, len(pts)).astype(np.float32)
    img, iimg = [np.asarray(a) for a in
                 project_points_with_intensity(jnp.asarray(pts), cfg)]

    # numpy oracle replicating the reference block verbatim
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    r = np.sqrt(np.clip(x * x, 0, 1e10) + np.clip(y * y, 0, 1e10)
                + np.clip(z * z, 0, 1e10)).astype(np.float32)
    az = np.mod(np.arctan2(y, x) + np.pi, 2 * np.pi)
    el = np.arctan2(z, np.sqrt(x * x + y * y))
    ok = (r >= cfg.min_range) & (r <= cfg.max_range)
    eb = np.clip(((el - cfg.elevation_min)
                  / (cfg.elevation_max - cfg.elevation_min)
                  * 16).astype(int), 0, 15)[ok]
    ab = np.clip((az / (2 * np.pi) * 90).astype(int), 0, 89)[ok]
    rv, iv = r[ok], pts[ok, 3]
    lin = eb * 90 + ab
    flat = np.full(16 * 90, np.inf, np.float32)
    np.minimum.at(flat, lin, rv)
    flat_i = np.zeros(16 * 90, np.float32)
    closest = rv == flat[lin]
    np.maximum.at(flat_i, lin[closest], iv[closest])
    flat[flat == np.inf] = 0.0
    np.testing.assert_array_equal(img, flat.reshape(16, 90))
    np.testing.assert_array_equal(iimg, flat_i.reshape(16, 90))


def test_compact_batch_projection_matches_scatter_path(rng):
    """The TPU batch projection (sort-compaction + butterfly expansion)
    must be bit-identical to the per-scan scatter path. The backend gate
    in project_points_batch hides this path from the CPU suite, so it is
    called directly here (CLAUDE.md: device code paths need a CPU parity
    test)."""
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import (
        ProjectionConfig, _project_points_batch_compact, project_points)

    for cfg in (ProjectionConfig(),                       # 64x360
                ProjectionConfig(n_elevation=16, n_azimuth=90),
                ProjectionConfig(n_elevation=128, n_azimuth=1024)):  # >2^16 px
        pts = rng.uniform(-50, 50, (4, 8192, 4)).astype(np.float32)
        pts[0, ::7] = np.nan
        pts[1, :8000] = 0.0  # mostly sub-min-range -> sparse scan
        got = np.asarray(jax.jit(
            lambda p, c=cfg: _project_points_batch_compact(p, c))(
                jnp.asarray(pts)))
        ref = np.asarray(jax.jit(jax.vmap(
            lambda p, c=cfg: project_points(p, c)))(jnp.asarray(pts)))
        np.testing.assert_array_equal(got, ref)


def test_fused_batch_sort_projection_bit_identical(rng, monkeypatch):
    """The fused-batch-sort variant (ONE flat sort with batch bits in the
    key, _segment_min_sorted_batch) must project bit-identically to the
    per-scan scatter path — the batch bits displace quantization bits,
    which must not change any pixel minimum. Default-off pending the TPU
    head-to-head (experiments/profile_hotpath.py); this parity holds
    either way."""
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops import range_image as ri

    monkeypatch.setattr(ri, "_FUSED_BATCH_SORT", True)
    for cfg, B in ((ri.ProjectionConfig(), 8),            # 64x360
                   (ri.ProjectionConfig(n_elevation=16, n_azimuth=90), 5),
                   (ri.ProjectionConfig(n_elevation=128,
                                        n_azimuth=1024), 3)):  # >2^17 px
        pts = rng.uniform(-50, 50, (B, 4096, 4)).astype(np.float32)
        pts[0, ::7] = np.nan
        pts[1, :4000] = 0.0  # mostly sub-min-range -> sparse scan
        # exact range ties across scans and within pixels stress the
        # quantization-bit reshuffle
        pts[2] = pts[B - 1]
        got = np.asarray(jax.jit(
            lambda p, c=cfg: ri._project_points_batch_compact(p, c))(
                jnp.asarray(pts)))
        ref = np.asarray(jax.jit(jax.vmap(
            lambda p, c=cfg: ri.project_points(p, c)))(jnp.asarray(pts)))
        np.testing.assert_array_equal(got, ref)


def test_fused_batch_sort_key_budget_guard():
    """Batch x image combinations that exceed the int31 key budget must
    fall back to the vmapped sorts instead of corrupting keys (the guard
    inside _project_points_batch_compact) and raise if called directly."""
    import jax.numpy as jnp
    import pytest
    from neural_spectral_codec_tpu.ops import range_image as ri

    n_pix = 1 << 28
    li = jnp.zeros((16, 8), jnp.int32)
    v = jnp.ones((16, 8), jnp.float32)
    with pytest.raises(ValueError):
        ri._segment_min_sorted_batch(li, v, 80.0, n_pix)


def test_monotone_expand_random(rng):
    """Butterfly expansion: brute-force random monotone instances."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import _monotone_expand
    M = 256
    for _ in range(50):
        n_flag = int(rng.integers(1, 100))
        tgts = np.sort(rng.choice(M, n_flag, replace=False))
        val = np.zeros((1, M), np.float32)
        flag = np.zeros((1, M), bool)
        disp = np.zeros((1, M), np.int32)
        val[0, :n_flag] = np.arange(1, n_flag + 1)
        flag[0, :n_flag] = True
        disp[0, :n_flag] = tgts - np.arange(n_flag)
        (out,), _ = _monotone_expand((jnp.asarray(val),), jnp.asarray(flag),
                                     jnp.asarray(disp), 8)
        ref = np.zeros(M)
        ref[tgts] = np.arange(1, n_flag + 1)
        np.testing.assert_array_equal(np.asarray(out)[0], ref)


def test_encoder_config_fuzz_vs_oracle(rng):
    """Randomized config sweep: the full device pipeline must match the
    numpy oracle for arbitrary (n_elev, n_azim, bins, ranges, alpha) —
    catches config-dependent packing/pooling/binning bugs."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)
    from tests.oracle import (oracle_encode_range_image, oracle_interpolate,
                              oracle_project)

    for trial in range(8):
        n_elev = int(rng.choice([8, 16, 32, 64, 96]))
        n_azim = int(rng.choice([60, 90, 180, 360, 720]))
        n_bins = int(rng.integers(5, 80))
        target = int(rng.choice([4, 8, 16]))
        alpha = float(rng.uniform(0.3, 6.0))
        elev = (float(rng.uniform(-40, -5)), float(rng.uniform(1, 20)))
        max_r = float(rng.uniform(40, 120))
        cfg = SpectralEncoderConfig(
            n_elevation=n_elev, n_azimuth=n_azim, n_bins=n_bins,
            target_elevation_bins=target, alpha=alpha,
            elevation_range_deg=elev, max_range=max_r, min_range=1.0)

        n_pts = int(rng.integers(2000, 9000))
        az = rng.uniform(-np.pi, np.pi, n_pts)
        el = rng.uniform(np.deg2rad(elev[0]), np.deg2rad(elev[1]), n_pts)
        r = rng.uniform(0.5, max_r * 0.9, n_pts)
        pts = np.stack([r * np.cos(el) * np.cos(az),
                        r * np.cos(el) * np.sin(az),
                        r * np.sin(el),
                        rng.uniform(0, 1, n_pts)], 1).astype(np.float32)

        got = np.asarray(encode_points_batch(
            jnp.asarray(pad_points(pts, 10240))[None],
            jnp.float32(alpha), cfg))[0]
        img = oracle_project(pts, n_elev=n_elev, n_azim=n_azim,
                             elev_deg=elev, min_range=1.0, max_range=max_r)
        want = oracle_encode_range_image(
            oracle_interpolate(img), target=target, n_bins=n_bins,
            alpha=alpha)
        np.testing.assert_allclose(
            got, want, atol=1e-6,
            err_msg=f"config: E{n_elev} A{n_azim} B{n_bins} T{target} "
                    f"a{alpha:.2f} elev{elev} R{max_r:.0f}")


def test_expand_pallas_interpret_random(rng):
    """Pallas butterfly expansion (interpret mode) vs direct placement."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.pallas_densify import expand_pallas
    B, N, NPIX = 3, 2048, 23040
    M = NPIX + N  # multiple of 128
    cval = np.zeros((B, M), np.float32)
    disp = np.zeros((B, M), np.float32)
    flag = np.zeros((B, M), np.float32)
    ref = np.zeros((B, NPIX), np.float32)
    for b in range(B):
        n_real = int(rng.integers(50, 2000))
        pix = np.sort(rng.choice(NPIX, n_real, replace=False))
        val = rng.uniform(1, 80, n_real).astype(np.float32)
        cval[b, :n_real] = val
        disp[b, :n_real] = pix - np.arange(n_real)
        flag[b, :n_real] = 1.0
        ref[b, pix] = val
    got = np.asarray(expand_pallas(jnp.asarray(cval), jnp.asarray(disp),
                                   jnp.asarray(flag), NPIX, True))
    np.testing.assert_array_equal(got, ref)


def test_class_wrappers_match_functional(rng):
    from neural_spectral_codec_tpu.ops.range_image import RangeImageProjector
    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoder
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import (
        pad_points, project_points, ProjectionConfig)
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)

    pts = rng.uniform(-40, 40, (5000, 4)).astype(np.float32)
    proj = RangeImageProjector(max_points=8192)
    img, iimg = proj.project(pts, keep_intensity=True)
    want = np.asarray(project_points(
        jnp.asarray(pad_points(pts, 8192)), ProjectionConfig()))
    np.testing.assert_array_equal(img, want)
    assert iimg.shape == img.shape
    back = proj.unproject(img)
    assert back.shape[1] == 3 and len(back) == (img > 0).sum()

    enc = SpectralEncoder(max_points=8192)
    d1 = enc.encode_points(pts)
    want_d = np.asarray(encode_points_batch(
        jnp.asarray(pad_points(pts, 8192))[None], jnp.float32(2.0),
        SpectralEncoderConfig()))[0]
    np.testing.assert_array_equal(d1, want_d)
    batch = enc([pts, pts])
    np.testing.assert_array_equal(batch[0], d1)
    np.testing.assert_allclose(enc.encode_range_image(img), d1, atol=1e-6)


def test_numpy_encoder_class(rng):
    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderNumpy
    enc = SpectralEncoderNumpy(max_points=8192)
    pts = rng.uniform(-40, 40, (5000, 4)).astype(np.float32)
    d = enc.encode_points(pts)
    assert d.shape == (50,)
    np.testing.assert_allclose(d.sum(), 1.0, atol=1e-6)

def test_densify_vmem_matches_xla(rng):
    """VMEM densification (compact_pallas chunks + merges + expand, in
    interpret mode) is bit-identical to the pure-XLA butterfly path across
    single-chunk, multi-chunk, sub-image, and empty-scan shapes."""
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops import range_image as ri

    n_pix = 64 * 360
    cases = [(4, 4096), (2, 33408), (2, 50000), (1, 133632), (3, 1000)]
    for B, N in cases:
        li = rng.integers(0, n_pix + 1, (B, N)).astype(np.int32)
        vals = np.where(li < n_pix,
                        rng.uniform(1.0, 80.0, (B, N)),
                        np.inf).astype(np.float32)
        sorted_idx, run_min, is_start = jax.vmap(
            lambda i, v: ri._segment_min_sorted(i, v, 80.0, n_pix)
        )(jnp.asarray(li), jnp.asarray(vals))
        start = is_start & (sorted_idx < n_pix)
        ref = np.asarray(ri._densify_xla(sorted_idx, run_min, start, n_pix))
        got = np.asarray(ri._densify_vmem(sorted_idx, run_min, start, n_pix,
                                          interpret=True))
        np.testing.assert_array_equal(got, ref, err_msg=f"B={B} N={N}")

    # all-invalid scan → all-zero image
    li = np.full((1, 2048), n_pix, np.int32)
    vals = np.full((1, 2048), np.inf, np.float32)
    sorted_idx, run_min, is_start = jax.vmap(
        lambda i, v: ri._segment_min_sorted(i, v, 80.0, n_pix)
    )(jnp.asarray(li), jnp.asarray(vals))
    start = is_start & (sorted_idx < n_pix)
    out = ri._densify_vmem(sorted_idx, run_min, start, n_pix, interpret=True)
    assert np.asarray(out).max() == 0.0


def test_monotone_compact_left_random(rng):
    """LSB-first leftward butterfly compaction: brute-force random
    instances vs the sort it replaces."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import (
        _monotone_compact_left)
    M = 512
    for _ in range(50):
        n_flag = int(rng.integers(1, M))
        src = np.sort(rng.choice(M, n_flag, replace=False))
        flag = np.zeros((1, M), bool)
        val = np.zeros((1, M), np.float32)
        pix = np.zeros((1, M), np.int32)
        disp = np.zeros((1, M), np.int32)
        flag[0, src] = True
        val[0, src] = rng.random(n_flag).astype(np.float32)
        pix[0, src] = np.sort(rng.choice(10 * M, n_flag, replace=False))
        disp[0, src] = src - np.arange(n_flag)
        (opix, oval), oflag = _monotone_compact_left(
            (jnp.asarray(pix), jnp.asarray(val)), jnp.asarray(flag),
            jnp.asarray(disp), 9)
        opix, oval, oflag = map(np.asarray, (opix, oval, oflag))
        assert oflag[0, :n_flag].all() and not oflag[0, n_flag:].any()
        np.testing.assert_array_equal(opix[0, :n_flag], pix[0, src])
        np.testing.assert_array_equal(oval[0, :n_flag], val[0, src])
