"""Auxiliary subsystems: profiling, config, logging.

The reference's ``src/utils/`` is an empty placeholder (SURVEY §1); its
actual aux code lives inline in train_multi_dataset.py. Here they are
first-class: a Profiler with device-aware timing, a validated YAML config
system (the reference's "Inherits from default.yaml" comments were
aspirational — here inheritance actually works), and logging setup.
"""

from neural_spectral_codec_tpu.utils.profiler import Profiler  # noqa: F401
from neural_spectral_codec_tpu.utils.config import (  # noqa: F401
    load_config,
    validate_config,
)
from neural_spectral_codec_tpu.utils.logging_setup import setup_logging  # noqa: F401
