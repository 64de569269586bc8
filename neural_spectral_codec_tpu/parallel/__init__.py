"""SPMD scaling layer: device meshes, sharded training and retrieval.

The reference's only parallelism is ``nn.DataParallel`` over 2 GPUs
(/root/reference/src/gnn/trainer.py:106-108) — disabled in its own main
recipe. This package is the TPU-native replacement: everything scales via
``jax.sharding.Mesh`` + jit/shard_map with XLA collectives over ICI:

  * data-parallel training — triplet batches sharded over the ``data``
    axis, parameters replicated, gradient ``psum`` inserted by the SPMD
    partitioner (parallel/train.py)
  * node-sharded keyframe graphs — the "sequence parallelism" analog for
    this workload: each chip owns a slab of graph nodes; the bounded-degree
    neighbor gather becomes an XLA-planned collective (parallel/train.py)
  * row-sharded retrieval database — local W₁ + local top-k per shard, one
    small all-gather, global top-k (parallel/retrieval.py)
  * batch-sharded descriptor encoding (parallel/encode.py)
"""

from neural_spectral_codec_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicate,
    shard_array,
)
from neural_spectral_codec_tpu.parallel.encode import (  # noqa: F401
    make_sharded_encoder,
)
from neural_spectral_codec_tpu.parallel.train import (  # noqa: F401
    make_sharded_train_step,
    pad_to_multiple,
)
from neural_spectral_codec_tpu.parallel.retrieval import (  # noqa: F401
    ShardedWassersteinRetriever,
)
