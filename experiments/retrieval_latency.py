#!/usr/bin/env python
"""Stage-1 retrieval latency: fp32 vs uint16 storage, measured on device.

Grounds the docs/performance.md retrieval table — in particular the
uint16 fixed-point storage mode (``retrieval.storage: uint16``), whose
TPU numbers were pending at round-4 writing time. uint16 halves the
bytes the bandwidth-bound database scan streams from HBM, so the
prediction is ~2x faster batched queries at the same database size (and
2x the max database per chip).

Timing follows docs/performance.md "Timing methodology": the query
kernel runs inside an on-device ``fori_loop`` whose next query depends
on this iteration's output (XLA cannot hoist the body), and every
number is the two-point form (t(N)-t(1))/(N-1), which cancels the
~30 ms tunnel dispatch+fetch constant.

Run:  python experiments/retrieval_latency.py [--size 100000]
      [--queries 256] [--iters 20] [--also-1m]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_BINS = 800


def _timed(make_many, x, iters):
    """Best-of-3 two-point timing of a jitted fori_loop program."""
    def run(n):
        fn = make_many(n)
        acc = fn(x)
        assert np.isfinite(float(acc)), "non-finite probe"
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(iters) - run(1)) / (iters - 1)


def measure_int_domain(db, size, n_queries, iters, top_k=10, single=False):
    """uint16 storage, but W₁ computed in the INTEGER domain: the query
    CDF is quantized to the same uint16 code grid once (Q x 800 — tiny),
    and the database scan is |int32(db) - int32(q)| summed in int32, with
    the single global 1/65535 scale applied to the final distance vector.
    Removes the per-element uint16→f32 convert+multiply that made the
    dequantizing kernel 1.7x SLOWER than fp32 single-query (measured
    2026-08-19) — the convert chain, not bandwidth, bound that scan."""
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.retrieval.retriever import _topk_smallest

    rng = np.random.default_rng(1)
    rows = db._db_cdf
    assert rows.dtype == jnp.uint16
    scale = jnp.float32(1.0 / 65535.0)

    if single:
        q1 = rng.random((N_BINS,), np.float32)
        q1 = q1 / q1.sum()
        qc = jax.device_put(jnp.asarray(
            np.round(np.cumsum(q1) * 65535.0).astype(np.int32)))

        def make_many(n):
            @jax.jit
            def many(qc, rows):
                def step(i, carry):
                    acc, qc = carry
                    d = jnp.sum(
                        jnp.abs(rows.astype(jnp.int32) - qc[None, :]),
                        axis=1)
                    dist = d.astype(jnp.float32) * scale
                    td, _ = _topk_smallest(dist, top_k)
                    acc = acc + td[0]
                    qc = qc + jnp.where(jnp.isnan(acc), jnp.int32(1),
                                        jnp.int32(0))
                    return acc, qc
                acc, _ = jax.lax.fori_loop(0, n, step,
                                           (jnp.float32(0), qc))
                return acc
            return lambda x: many(x, rows)

        return _timed(make_many, qc, iters)

    q = rng.random((n_queries, N_BINS), np.float32)
    q = q / q.sum(axis=1, keepdims=True)
    qc = jax.device_put(jnp.asarray(
        np.round(np.cumsum(q, axis=1) * 65535.0).astype(np.int32)))

    def make_many(n):
        @jax.jit
        def many(qc, rows):
            def step(i, carry):
                acc, qc = carry
                d = jnp.sum(
                    jnp.abs(rows[None, :, :].astype(jnp.int32)
                            - qc[:, None, :]), axis=2)
                dist = d.astype(jnp.float32) * scale
                td, _ = _topk_smallest(dist, top_k)
                acc = acc + td[0, 0]
                qc = qc + jnp.where(jnp.isnan(acc), jnp.int32(1),
                                    jnp.int32(0))
                return acc, qc
            acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0), qc))
            return acc
        return lambda x: many(x, rows)

    return _timed(make_many, qc, iters) / n_queries


def measure(db, size, n_queries, iters, top_k=10, single=False):
    """Per-query device time of the fused query kernel against ``db``
    (a WassersteinRetriever with ``size`` rows inserted). ``single``
    times the Q=1 kernel (`_query_kernel`) — the online-serving shape,
    where the database scan is bandwidth-bound and uint16's halved
    bytes should show; the batched shape is compute-bound in the
    Q x N x d L1 reduction, so storage width barely moves it."""
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.retrieval.retriever import (
        _query_batch_kernel, _query_kernel)

    rng = np.random.default_rng(1)
    if single:
        q1 = rng.random((N_BINS,), np.float32)
        q1 = jax.device_put(jnp.asarray(q1 / q1.sum()))
        qp1 = jax.device_put(jnp.zeros(4, jnp.float32))
        rows, pos = db._db_cdf, db._db_pos
        sz = jnp.int32(size)

        def make_many(n):
            @jax.jit
            def many(q, rows, pos):
                def step(i, carry):
                    acc, q = carry
                    _, dist = _query_kernel(rows, pos, sz, q, qp1, top_k,
                                            "wasserstein")
                    acc = acc + dist[0]
                    q = q + jnp.where(jnp.isnan(acc), jnp.float32(1),
                                      jnp.float32(0))
                    return acc, q
                acc, _ = jax.lax.fori_loop(0, n, step,
                                           (jnp.float32(0), q))
                return acc
            return lambda x: many(x, rows, pos)

        return _timed(make_many, q1, iters)

    q = rng.random((n_queries, N_BINS), np.float32)
    q = jax.device_put(jnp.asarray(q / q.sum(axis=1, keepdims=True)))
    qp = jax.device_put(jnp.zeros((n_queries, 4), jnp.float32))
    rows, pos = db._db_cdf, db._db_pos
    sz = jnp.int32(size)

    # NOTE: the database buffers must be ARGUMENTS of the jitted loop,
    # not closure captures — captured device arrays become embedded
    # constants in the compile payload, and at 100k x 800 f32 (320 MB)
    # the axon tunnel's remote_compile endpoint rejects the request
    # (HTTP 413).
    def make_many(n):
        @jax.jit
        def many(q, rows, pos):
            def step(i, carry):
                acc, q = carry
                _, dist = _query_batch_kernel(rows, pos, sz, q, qp, top_k,
                                              "wasserstein")
                acc = acc + dist[0, 0]
                # data-dependent feedback: acc stays finite, q unchanged,
                # but XLA cannot hoist the body (timing trap #1)
                q = q + jnp.where(jnp.isnan(acc), jnp.float32(1),
                                  jnp.float32(0))
                return acc, q
            acc, _ = jax.lax.fori_loop(0, n, step,
                                       (jnp.float32(0), q))
            return acc
        return lambda x: many(x, rows, pos)

    per_iter = _timed(make_many, q, iters)
    return per_iter / n_queries


def build_db(storage, size, capacity):
    from neural_spectral_codec_tpu.retrieval.retriever import (
        WassersteinRetriever)
    db = WassersteinRetriever(n_bins=N_BINS, capacity=capacity,
                              storage=storage)
    rng = np.random.default_rng(0)
    chunk = 50_000
    for s in range(0, size, chunk):
        m = min(chunk, size - s)
        h = rng.random((m, N_BINS), np.float32)
        db.add_to_database(h / h.sum(axis=1, keepdims=True),
                           rng.random((m, 3), np.float32) * 1000)
    return db


def ranking_parity(size, n_queries=64, top_k=10, seed=7):
    """Top-k ranking agreement between fp32 and uint16 storage at the
    same database contents: fraction of queries whose top-1 matches, and
    mean top-k overlap. Uses the PRODUCTION query path for both."""
    from neural_spectral_codec_tpu.retrieval.retriever import (
        WassersteinRetriever)
    rng = np.random.default_rng(seed)
    dbs = {}
    rows_np = None
    for storage in ("float32", "uint16"):
        db = WassersteinRetriever(n_bins=N_BINS, capacity=size,
                                  storage=storage)
        r = np.random.default_rng(0)
        chunk = 50_000
        for s in range(0, size, chunk):
            m = min(chunk, size - s)
            h = r.random((m, N_BINS), np.float32)
            db.add_to_database(h / h.sum(axis=1, keepdims=True),
                               r.random((m, 3), np.float32) * 1000)
        dbs[storage] = db
    q = rng.random((n_queries, N_BINS), np.float32)
    q = q / q.sum(axis=1, keepdims=True)
    idx_f, _ = dbs["float32"].query_batch(q, top_k=top_k)
    idx_u, _ = dbs["uint16"].query_batch(q, top_k=top_k)
    top1 = float(np.mean(idx_f[:, 0] == idx_u[:, 0]))
    overlap = float(np.mean([
        len(set(idx_f[i]) & set(idx_u[i])) / top_k
        for i in range(n_queries)]))
    del dbs
    return {"top1_match": top1, f"top{top_k}_overlap": overlap,
            "n_queries": n_queries}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=100_000)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--also-1m", action="store_true",
                   help="additionally measure both storages at 1M rows "
                        "(needs ~4.8 GB free HBM for the fp32 pass)")
    p.add_argument("--single", action="store_true",
                   help="also time the Q=1 online-serving kernel, where "
                        "the database scan is bandwidth-bound")
    p.add_argument("--int-domain", action="store_true",
                   help="for uint16, also time the integer-domain W1 "
                        "candidate (no per-element dequant convert)")
    p.add_argument("--sweep", action="store_true",
                   help="the VERDICT-r4 #2 matrix: sizes 100k/1M/2M x "
                        "storage x (single+batched+int-domain) plus a "
                        "1M ranking-parity check; writes "
                        "experiments/retrieval_latency.json")
    p.add_argument("--platform", choices=("cpu", "tpu", "axon"),
                   help="force a JAX platform (CPU smoke runs)")
    args = p.parse_args(argv)

    from neural_spectral_codec_tpu.utils.platform import force_platform
    force_platform(args.platform)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    if args.sweep:
        import json
        out = {"queries": args.queries, "iters": args.iters, "rows": []}
        for size in (100_000, 1_000_000, 2_000_000):
            for storage in ("float32", "uint16"):
                if storage == "float32" and size > 1_000_000:
                    # 2M x 800 f32 = 6.4 GB of HBM for a mode whose point
                    # is that uint16 makes 2M practical; measured at 1M
                    continue
                db = build_db(storage, size, capacity=size)
                gb = size * N_BINS * (4 if storage == "float32" else 2) / 1e9
                row = {"size": size, "storage": storage, "db_gb": gb}
                row["batched_us"] = 1e6 * measure(
                    db, size, args.queries, args.iters)
                row["single_us"] = 1e6 * measure(
                    db, size, 1, args.iters, single=True)
                if storage == "uint16":
                    row["int_batched_us"] = 1e6 * measure_int_domain(
                        db, size, args.queries, args.iters)
                    row["int_single_us"] = 1e6 * measure_int_domain(
                        db, size, 1, args.iters, single=True)
                print(row, flush=True)
                out["rows"].append(row)
                del db
        print("ranking parity at 1M rows...", file=sys.stderr, flush=True)
        out["parity_1m"] = ranking_parity(1_000_000)
        print(out["parity_1m"], flush=True)
        path = Path(__file__).parent / "retrieval_latency.json"
        path.write_text(json.dumps(out, indent=2))
        print(f"wrote {path}", file=sys.stderr)
        return

    sizes = [args.size] + ([1_000_000] if args.also_1m else [])
    for size in sizes:
        for storage in ("float32", "uint16"):
            db = build_db(storage, size, capacity=size)
            gb = size * N_BINS * (4 if storage == "float32" else 2) / 1e9
            us = 1e6 * measure(db, size, args.queries, args.iters)
            print(f"size={size:>9,}  storage={storage:<8} "
                  f"batched({args.queries}): {us:8.2f} us/query "
                  f"(db {gb:.2f} GB)", flush=True)
            if args.single:
                us1 = 1e6 * measure(db, size, 1, args.iters, single=True)
                print(f"size={size:>9,}  storage={storage:<8} "
                      f"single query      : {us1:8.2f} us/query "
                      f"({gb / (us1 / 1e6):7.1f} GB/s effective scan)",
                      flush=True)
            if args.int_domain and storage == "uint16":
                usb = 1e6 * measure_int_domain(db, size, args.queries,
                                               args.iters)
                print(f"size={size:>9,}  storage=u16-int  "
                      f"batched({args.queries}): {usb:8.2f} us/query",
                      flush=True)
                if args.single:
                    us1 = 1e6 * measure_int_domain(db, size, 1, args.iters,
                                                   single=True)
                    print(f"size={size:>9,}  storage=u16-int  "
                          f"single query      : {us1:8.2f} us/query "
                          f"({gb / (us1 / 1e6):7.1f} GB/s effective scan)",
                          flush=True)
            del db


if __name__ == "__main__":
    main()
