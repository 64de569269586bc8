"""--platform CLI flag (utils/platform.py).

Env vars alone cannot override plugin-registered backends (the plugin's
registration hook can rewrite JAX_PLATFORMS), so the entry points expose
--platform, which also applies jax.config.update("jax_platforms", ...) —
the forcing tests/conftest.py itself relies on. The subprocess test runs
the real CLI under the ambient (possibly TPU-plugin) environment and
must complete on CPU even when the plugin's device lease is unreachable.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_force_platform_default_is_noop(monkeypatch):
    from neural_spectral_codec_tpu.utils.platform import force_platform
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    force_platform(None)
    force_platform("default")
    assert "JAX_PLATFORMS" not in os.environ


def test_cli_flags_reach_force_platform(tmp_path, monkeypatch):
    """Both entry points must route --platform through force_platform
    BEFORE touching jax (checked in-process with a recording stub)."""
    import yaml

    from neural_spectral_codec_tpu.utils import platform as plat
    from tests.test_pipeline import small_config

    calls = []
    monkeypatch.setattr(plat, "force_platform", calls.append)

    import train_multi_dataset
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump(small_config(tmp_path)))
    train_multi_dataset.main([
        "--config", str(cfg_file),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--epochs", "1", "--synthetic", "30", "--platform", "default"])
    assert calls == ["default"]

    import run_benchmark
    run_benchmark.main([
        "--config", str(cfg_file), "--synthetic", "4",
        "--output", str(tmp_path / "r.json"), "--platform", "default"])
    assert calls == ["default", "default"]


def test_run_benchmark_subprocess_platform_cpu(tmp_path):
    """The real CLI in a fresh process with the ambient platform env must
    complete on CPU when told --platform cpu — even if the ambient env
    points at a TPU plugin whose lease is unreachable (this exact
    scenario occurred live: env-only JAX_PLATFORMS=cpu hung in plugin
    init; the config-update forcing did not)."""
    env = dict(os.environ)
    # undo the conftest CPU forcing so the subprocess sees the ambient
    # platform resolution the driver runs CLIs under
    for k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS"):
        env.pop(k, None)
    out = tmp_path / "results.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "run_benchmark.py"),
         "--config", str(REPO / "configs" / "inference.yaml"),
         "--synthetic", "4", "--platform", "cpu",
         "--output", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()
    json.loads(out.read_text())
