"""Read-ahead frame iteration over the dataset loaders via the native IO
library (native/nsc_io.cpp).

The reference reads and decodes every scan synchronously inside its
per-scan hot loop (reference train_multi_dataset.py:166); here C++ worker
threads read + decode ahead of the consumer so disk IO overlaps keyframe
selection and encoding. Decode is bit-identical to the numpy loaders
(pinned by tests/test_native_io.py), and any per-file native error falls
back to ``loader[idx]`` so error semantics (skip-and-log of corrupt
scans) are exactly the Python path's.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

import numpy as np

from neural_spectral_codec_tpu.data.helipr import HeLiPRLoader
from neural_spectral_codec_tpu.data.kitti import KITTILoader
from neural_spectral_codec_tpu.data.nclt import NCLTLoader
from neural_spectral_codec_tpu.native import io as native_io

logger = logging.getLogger(__name__)


def _format_and_files(loader):
    if isinstance(loader, KITTILoader):
        return native_io.FORMAT_KITTI, loader.frame_files
    if isinstance(loader, NCLTLoader):
        return native_io.FORMAT_NCLT, loader.frame_files
    if isinstance(loader, HeLiPRLoader):
        # 5-float rows: the explicit ring ids ride along for the ring
        # fast path (helipr.py _load_velodyne_full)
        return native_io.FORMAT_HELIPR5, loader.scan_files
    return None, None


class FramePrefetcher:
    """Sequential frame access with native read-ahead.

    ``get(idx)`` must be called for idx = 0, 1, 2, ... and returns the
    same item dict as ``loader[idx]``. Construct via :meth:`create`,
    which returns None whenever the native path cannot apply (unknown
    loader type, preloaded points, library unavailable) — callers then
    use plain indexing. Close when done (context manager supported).
    """

    def __init__(self, loader, prefetcher: native_io.NativePrefetcher):
        self._loader = loader
        self._native = prefetcher

    @classmethod
    def create(cls, loader, n_threads: int = 4, depth: int = 8,
               mode: str = "auto") -> Optional["FramePrefetcher"]:
        """mode: "auto" prefetches only the decode-bound formats (NCLT
        12-byte unpack 6.9x faster native+overlapped, HeLiPR strided
        gather ~neutral hot-cache / wins cold); KITTI decode is already a
        bare memcpy so hot-cache prefetch only adds a copy — mode "always"
        includes it for cold-storage deployments, "off" disables all."""
        if mode == "off":
            return None
        fmt, files = _format_and_files(loader)
        if fmt is None or not getattr(loader, "lazy_load", False):
            return None
        if mode == "auto" and fmt == native_io.FORMAT_KITTI:
            return None
        if not native_io.available():
            return None
        try:
            native = native_io.NativePrefetcher(
                [str(f) for f in files], fmt, n_threads=n_threads,
                depth=depth)
        except Exception as e:
            logger.warning("native prefetch unavailable: %s", e)
            return None
        return cls(loader, native)

    def get(self, idx: int) -> dict:
        status, points = self._native.get(idx)
        if status != native_io.STATUS_OK:
            # reproduce the Python path's exact behavior for this file
            # (raise, or e.g. NCLT's empty-cloud recovery)
            return self._loader[idx]
        if points.shape[1] == 5:  # HeLiPR5: split the ring column off
            return self._loader._assemble(
                idx, np.ascontiguousarray(points[:, :4]),
                points[:, 4].astype(np.int64))
        return self._loader._assemble(idx, points)

    def close(self) -> None:
        self._native.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@contextlib.contextmanager
def frame_source(loader, config: Optional[dict] = None):
    """Context manager yielding a ``get(idx)`` callable over ``loader``
    frames, prefetched natively when ``system.io_prefetch`` allows
    ("auto" default; booleans mean always/off — unquoted YAML `off`
    parses as False). Deterministically closes the prefetcher on any
    exit path. This is the one place the config knob is interpreted."""
    from neural_spectral_codec_tpu.utils.config import get as cfg_get

    mode = cfg_get(config or {}, "system.io_prefetch", "auto")
    if isinstance(mode, bool):
        mode = "always" if mode else "off"
    prefetcher = FramePrefetcher.create(loader, mode=mode)
    try:
        yield (loader.__getitem__ if prefetcher is None
               else prefetcher.get)
    finally:
        if prefetcher is not None:
            prefetcher.close()
