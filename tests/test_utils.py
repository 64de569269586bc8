"""Profiler, config inheritance/validation, logging setup."""

import time
from pathlib import Path

import pytest

from neural_spectral_codec_tpu.utils.config import (
    ConfigError, get, load_config, validate_config)
from neural_spectral_codec_tpu.utils.profiler import Profiler

CONFIGS = Path(__file__).resolve().parent.parent / "configs"


def test_profiler_sections():
    p = Profiler()
    with p.profile("a"):
        time.sleep(0.01)
    with p.profile("b"):
        time.sleep(0.002)
    with p.profile("a"):
        pass
    assert p.counts["a"] == 2 and p.counts["b"] == 1
    assert p.totals["a"] >= 0.01
    s = p.summary()
    assert "a" in s and "%" in s


def test_profiler_unbalanced_stop():
    p = Profiler()
    with pytest.raises(KeyError):
        p.stop("never_started")


def test_all_shipped_configs_load_and_validate():
    for f in CONFIGS.glob("*.yaml"):
        cfg = load_config(str(f))
        assert "encoding" in cfg, f"{f.name} missing encoding (inheritance broken?)"


def test_config_inheritance_overrides():
    cfg = load_config(str(CONFIGS / "training_multi_dataset.yaml"))
    # overridden in the child
    assert cfg["keyframe"]["distance_threshold"] == 0.8
    # inherited from training.yaml
    assert cfg["training"]["learning_rate"] == 5e-4
    # inherited from default.yaml through two levels
    assert cfg["encoding"]["n_bins"] == 50
    assert cfg["gnn"]["hidden_dim"] == 256


def test_config_validation_rejects_bad_values():
    with pytest.raises(ConfigError):
        validate_config({"encoding": {"n_bins": -1}})
    with pytest.raises(ConfigError):
        validate_config({"gnn": {"dropout": 1.5}})
    with pytest.raises(ConfigError):
        validate_config({"encoding": {"min_range": 90.0, "max_range": 80.0}})
    with pytest.raises(ConfigError):
        validate_config({"training": {"learning_rate": "fast"}})


def test_config_dotted_get():
    cfg = {"a": {"b": {"c": 3}}}
    assert get(cfg, "a.b.c") == 3
    assert get(cfg, "a.x", 7) == 7
