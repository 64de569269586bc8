"""Import-level rot guard for the experiment scripts.

The experiments under ``experiments/`` are the repo's measured-evidence
producers (docs/performance.md, docs/density_defense.md,
docs/cross_sensor.md all cite them). They are not exercised by the unit
suite — full runs take minutes to hours — so API drift in the package
would otherwise surface only when someone re-runs one. This test loads
each script as a module (executing imports and top-level code, not
``main()``), which catches renamed/removed package symbols, signature
changes at module scope, and syntax errors in seconds.

(Each script was also end-to-end smoke-run on CPU with tiny arguments on
2026-08-18; this guard keeps the cheap part of that check in the suite.)
"""

import importlib.util
import sys
from pathlib import Path

import pytest

EXPERIMENTS = sorted(
    (Path(__file__).resolve().parent.parent / "experiments").glob("*.py"))


@pytest.mark.parametrize("path", EXPERIMENTS, ids=lambda p: p.stem)
def test_experiment_imports(path):
    spec = importlib.util.spec_from_file_location(
        f"_exp_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(getattr(mod, "main", None)), \
        f"{path.name} must expose a main() entry point"


def test_experiment_inventory():
    """The documented experiment set exists (docs cite these by name)."""
    names = {p.stem for p in EXPERIMENTS}
    assert {"cross_sensor_uplift", "degraded_recall", "density_defense",
            "online_latency", "profile_hotpath", "scale_100k",
            "selection_divergence"} <= names
