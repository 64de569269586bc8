"""The bench.py two-phase supervisor (wedge-aware retry logic).

BENCH_r03 was lost to a wedged axon lease: the child hung at the first
backend touch and the whole round shipped no driver-captured perf
number. The supervisor now distinguishes init-phase hangs (safe to kill
— no compile in flight — and worth many retries, because lease resets
take minutes) from post-init failures (real errors, few retries). These
tests drive ``supervise()`` with fake child processes; no backend is
touched.
"""

import json
import subprocess
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def fast_supervisor(monkeypatch):
    # INIT_TIMEOUT_S must comfortably exceed `python -c` startup on a
    # fully loaded machine (the suite runs an 8-device CPU mesh; 2 s was
    # measured too tight — children got misclassified as init hangs).
    monkeypatch.setattr(bench, "INIT_TIMEOUT_S", 8)
    monkeypatch.setattr(bench, "RUN_STALL_S", 8)
    monkeypatch.setattr(bench, "RUN_TIMEOUT_S", 30)
    monkeypatch.setattr(bench, "BACKOFFS_S", (0.05,))
    yield


def _child(script, monkeypatch):
    monkeypatch.setattr(bench, "CHILD_CMD", [sys.executable, "-c", script])


def test_success_passes_json_through(monkeypatch, capsys):
    _child(
        "import sys, json;"
        f"print({bench.BACKEND_MARKER!r}, file=sys.stderr);"
        "print(json.dumps({'metric': 'm', 'value': 1}))",
        monkeypatch)
    assert bench.supervise() == 0
    out = capsys.readouterr().out.strip()
    assert json.loads(out)["value"] == 1


def test_init_hang_killed_fast_and_counted(monkeypatch, capsys):
    # Child never prints the marker: an init-phase (wedge) hang. The
    # supervisor must kill it around INIT_TIMEOUT_S (not RUN_TIMEOUT_S)
    # and classify every attempt as an init failure.
    monkeypatch.setattr(bench, "INIT_ATTEMPTS", 2)
    _child("import time; time.sleep(60)", monkeypatch)
    import time
    t0 = time.time()
    assert bench.supervise() == 1
    assert time.time() - t0 < 2 * bench.RUN_TIMEOUT_S
    err_line = json.loads(capsys.readouterr().out.strip())
    assert err_line["value"] == 0
    assert "2 in backend init" in err_line["error"]


def test_post_init_failure_uses_real_budget(monkeypatch, capsys):
    monkeypatch.setattr(bench, "REAL_ATTEMPTS", 2)
    _child(
        "import sys;"
        f"print({bench.BACKEND_MARKER!r}, file=sys.stderr);"
        "print('boom', file=sys.stderr); sys.exit(3)",
        monkeypatch)
    assert bench.supervise() == 1
    err_line = json.loads(capsys.readouterr().out.strip())
    assert "2 after" in err_line["error"]
    assert "rc=3" in err_line["error"]


def test_early_death_before_marker_returns_quickly(monkeypatch):
    # A child that dies before the marker (e.g. import error) must not
    # block for the full INIT_TIMEOUT_S.
    monkeypatch.setattr(bench, "INIT_TIMEOUT_S", 30)
    monkeypatch.setattr(bench, "INIT_ATTEMPTS", 1)
    _child("import sys; sys.exit(7)", monkeypatch)
    import time
    t0 = time.time()
    assert bench.supervise() == 1
    assert time.time() - t0 < 15


def test_deterministic_premarker_exit_uses_real_budget(monkeypatch, capsys):
    # An ImportError-style fast exit before the marker is DETERMINISTIC:
    # it must burn the small real-failure budget (fast diagnosis), not
    # the 10-attempt init budget with ~27 min of backoff sleep.
    monkeypatch.setattr(bench, "REAL_ATTEMPTS", 2)
    monkeypatch.setattr(bench, "INIT_ATTEMPTS", 10)
    _child("import sys; print('ImportError: nope', file=sys.stderr);"
           "sys.exit(1)", monkeypatch)
    assert bench.supervise() == 1
    err_line = json.loads(capsys.readouterr().out.strip())
    assert "2 after" in err_line["error"]


def test_transient_backend_exit_keeps_patient_retries(monkeypatch, capsys):
    # BENCH_r03's actual failure: a fast pre-marker EXIT raising
    # UNAVAILABLE. That is lease-transient and must be classified as an
    # init failure (patient retries), not a deterministic error.
    monkeypatch.setattr(bench, "INIT_ATTEMPTS", 3)
    monkeypatch.setattr(bench, "REAL_ATTEMPTS", 1)
    _child("import sys;"
           "print('jax.errors.JaxRuntimeError: UNAVAILABLE: TPU backend "
           "setup/compile error', file=sys.stderr); sys.exit(1)",
           monkeypatch)
    assert bench.supervise() == 1
    err_line = json.loads(capsys.readouterr().out.strip())
    assert "3 in backend init" in err_line["error"]


def test_run_phase_stall_detected_by_silence(monkeypatch, capsys):
    # Post-marker, a child with ZERO stderr activity for RUN_STALL_S is
    # hung (not compiling) and must be killed and counted as a real
    # failure well before the absolute cap.
    monkeypatch.setattr(bench, "RUN_STALL_S", 3)
    monkeypatch.setattr(bench, "RUN_TIMEOUT_S", 60)
    monkeypatch.setattr(bench, "REAL_ATTEMPTS", 1)
    _child(
        "import sys, time;"
        f"print({bench.BACKEND_MARKER!r}, file=sys.stderr, flush=True);"
        "time.sleep(120)", monkeypatch)
    import time
    t0 = time.time()
    assert bench.supervise() == 1
    assert time.time() - t0 < 45
    err_line = json.loads(capsys.readouterr().out.strip())
    assert "stalled" in err_line["error"]


def test_run_phase_heartbeats_defeat_stall_kill(monkeypatch, capsys):
    # A child that keeps printing progress (as main()'s heartbeats do
    # between compile-heavy stages) must NOT be stall-killed even when
    # its total runtime (8 s) exceeds RUN_STALL_S (4 s). Heartbeats every
    # 0.5 s leave an 8x scheduling margin against the stall window — a
    # loaded suite machine stretched 1 s sleeps past a 2 s window once.
    monkeypatch.setattr(bench, "RUN_STALL_S", 4)
    monkeypatch.setattr(bench, "RUN_TIMEOUT_S", 60)
    _child(
        "import sys, time, json;"
        f"print({bench.BACKEND_MARKER!r}, file=sys.stderr, flush=True);"
        "[ (time.sleep(0.5), print('hb', file=sys.stderr, flush=True))"
        "  for _ in range(16) ];"
        "print(json.dumps({'metric': 'm', 'value': 3}))", monkeypatch)
    assert bench.supervise() == 0
    assert json.loads(capsys.readouterr().out.strip())["value"] == 3


def test_recovery_after_init_hangs(monkeypatch, capsys, tmp_path):
    # First two attempts hang in init (wedged lease), the third
    # succeeds — the supervisor must ride it out and return 0.
    flag = tmp_path / "n"
    script = (
        "import sys, json, pathlib;"
        f"p = pathlib.Path({str(flag)!r});"
        "n = int(p.read_text()) if p.exists() else 0;"
        "p.write_text(str(n + 1));"
        "import time;"
        "time.sleep(60) if n < 2 else None;"
        f"print({bench.BACKEND_MARKER!r}, file=sys.stderr);"
        "print(json.dumps({'metric': 'm', 'value': 2}))")
    _child(script, monkeypatch)
    assert bench.supervise() == 0
    assert json.loads(capsys.readouterr().out.strip())["value"] == 2
