"""Wall-clock section profiler (reference train_multi_dataset.py:58-124).

Named start/stop accumulators, a ``profile()`` context manager, and a
percentage summary table. Device-aware: ``profile(..., sync=x)`` blocks on
a JAX array before stopping the clock so asynchronously dispatched device
work is attributed to the section that launched it (the reference's CUDA
timings had the same hazard and ignored it).

For deep kernel-level traces use ``trace()`` which wraps
``jax.profiler.trace`` (view in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class Profiler:
    def __init__(self):
        self._start: Dict[str, float] = {}
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def start(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        if name not in self._start:
            raise KeyError(f"Profiler section never started: {name}")
        dt = time.perf_counter() - self._start.pop(name)
        self.totals[name] += dt
        self.counts[name] += 1
        return dt

    @contextlib.contextmanager
    def profile(self, name: str, sync=None):
        """Time a section. ``sync`` may be a JAX array (or pytree) to
        block on before the clock stops."""
        self.start(name)
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            self.stop(name)

    @contextlib.contextmanager
    def trace(self, log_dir: str):
        """Kernel-level device trace via jax.profiler (TensorBoard)."""
        import jax
        with jax.profiler.trace(log_dir):
            yield

    def summary(self) -> str:
        total = sum(self.totals.values())
        lines = [
            "=" * 64,
            f"{'Section':<30s} {'Total (s)':>10s} {'Calls':>7s} {'%':>6s}",
            "-" * 64,
        ]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total > 0 else 0.0
            lines.append(
                f"{name:<30s} {t:>10.3f} {self.counts[name]:>7d} {pct:>5.1f}%")
        lines.append("=" * 64)
        return "\n".join(lines)

    def log_summary(self) -> None:
        for line in self.summary().splitlines():
            logger.info(line)

    def reset(self) -> None:
        self._start.clear()
        self.totals.clear()
        self.counts.clear()
