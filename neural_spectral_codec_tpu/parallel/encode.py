"""Batch-sharded descriptor encoding.

The per-scan encoder (ops/spectral.py) is embarrassingly parallel over
scans: shard the scan batch's leading axis across the mesh and jit with
explicit shardings — XLA runs each chip on its slab with zero collectives
(descriptors come back shard-aligned for downstream sharded consumers).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig,
    encode_points_batch,
)


def make_sharded_encoder(config: SpectralEncoderConfig,
                         mesh: Mesh) -> Callable:
    """Returns ``fn(points (B,N,3|4) sharded over data, alpha) ->
    (B, output_dim) descriptors, sharded the same way``. B must be a
    multiple of the mesh size."""
    batch_sh = NamedSharding(mesh, P("data", None, None))
    out_sh = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit,
                       in_shardings=(batch_sh, repl),
                       out_shardings=out_sh)
    def encode(points, alpha):
        return encode_points_batch(points, alpha, config)

    return encode


def make_sharded_ring_encoder(config: SpectralEncoderConfig, mesh: Mesh,
                              row_of_ring) -> Callable:
    """Batch-sharded variant of the ring fast path
    (ops/ring_path.encode_points_ring_batch): ``fn(points (B,R,P,3|4)
    sharded over data, alpha)``. Same zero-collective structure as
    :func:`make_sharded_encoder` — each chip encodes its slab of
    ring-structured scans."""
    from neural_spectral_codec_tpu.ops.ring_path import (
        encode_points_ring_batch)
    rows = tuple(int(v) for v in row_of_ring)
    batch_sh = NamedSharding(mesh, P("data", None, None, None))
    out_sh = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit,
                       in_shardings=(batch_sh, repl),
                       out_shardings=out_sh)
    def encode(points, alpha):
        return encode_points_ring_batch(points, alpha, config, rows)

    return encode
