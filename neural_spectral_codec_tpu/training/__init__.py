"""Training: triplet loss, on-device mining, jitted train loop, validation."""

from neural_spectral_codec_tpu.training.loss import triplet_loss  # noqa: F401
from neural_spectral_codec_tpu.training.miner import (  # noqa: F401
    TripletMiner,
    create_triplet_miner,
)
from neural_spectral_codec_tpu.training.validation import (  # noqa: F401
    recall_loop_closure,
    find_revisit_queries,
)
from neural_spectral_codec_tpu.training.trainer import (  # noqa: F401
    GNNTrainer,
    create_trainer,
)
