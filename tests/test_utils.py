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


REFERENCE_CONFIGS = Path("/root/reference/configs")


@pytest.mark.skipif(not REFERENCE_CONFIGS.exists(),
                    reason="reference configs not on disk")
def test_reference_configs_load_verbatim_without_warnings(caplog):
    """Drop-in compatibility: all five reference YAMLs pass load_config
    unchanged — no unknown-section warnings (`ros`, `gpu` included), no
    validation errors. Reference: configs/inference.yaml:89-95 (ros),
    configs/training.yaml (gpu block)."""
    import logging
    for f in sorted(REFERENCE_CONFIGS.glob("*.yaml")):
        with caplog.at_level(logging.WARNING,
                             logger="neural_spectral_codec_tpu.utils.config"):
            cfg = load_config(str(f))
        bad = [r.message % r.args for r in caplog.records
               if "Unknown config section" in r.message]
        assert not bad, f"{f.name}: {bad}"
        assert isinstance(cfg, dict) and cfg
        caplog.clear()


@pytest.mark.skipif(not REFERENCE_CONFIGS.exists(),
                    reason="reference configs not on disk")
def test_reference_configs_construct_pipeline():
    """The live keys of each reference config land on the constructed
    pipeline objects (encoder geometry, keyframe thresholds, GNN dims,
    retrieval thresholds, database capacity)."""
    from neural_spectral_codec_tpu.pipeline import NeuralSpectralCodecPipeline

    cfg = load_config(str(REFERENCE_CONFIGS / "default.yaml"))
    pipe = NeuralSpectralCodecPipeline(cfg)
    assert pipe.encoder_config.n_bins == 50
    assert pipe.encoder_config.output_dim == 800
    assert pipe.encoder_config.n_azimuth == 360
    assert pipe.selector.criteria.distance_threshold == 0.5
    assert pipe.selector.criteria.rotation_threshold == 15.0
    assert pipe.model.input_dim == 800 and pipe.model.hidden_dim == 800
    assert pipe.retrieval.top_k == 10
    assert pipe.retrieval.spatial_filter_distance == 50.0
    del pipe

    inf = load_config(str(REFERENCE_CONFIGS / "inference.yaml"))
    pipe = NeuralSpectralCodecPipeline(inf)
    assert pipe.retrieval.retriever.capacity == 100_000
    assert pipe.retrieval.parallel_verification
    # loop_closing.min_loop_distance is the reference-surface alias for
    # the stage-1 spatial exclusion radius
    assert pipe.retrieval.spatial_filter_distance == 50.0
    del pipe

    hel = load_config(str(REFERENCE_CONFIGS / "training_helipr_to_kitti.yaml"))
    pipe = NeuralSpectralCodecPipeline(hel)
    # reference quirk preserved verbatim: this config's gnn dims are 50
    # (training_helipr_to_kitti.yaml:99-101), inconsistent with the 800-D
    # descriptors but accepted as written
    assert pipe.model.input_dim == 50
    assert pipe.encoder_config.elevation_range_deg == (-15.0, 15.0)
    assert pipe.selector.criteria.overlap_threshold == 0.65


def test_config_dotted_get():
    cfg = {"a": {"b": {"c": 3}}}
    assert get(cfg, "a.b.c") == 3
    assert get(cfg, "a.x", 7) == 7
