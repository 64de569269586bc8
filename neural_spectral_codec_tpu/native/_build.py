"""Shared on-demand build + dlopen for the native C++ libraries.

Both native libraries (geometry, IO) are built by the same
``make -C native`` and loaded through ctypes with a per-library symbol
configuration callback; this module owns the build/lock/failure-cache
scaffolding so it exists exactly once.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Callable, Dict, Optional

logger = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"

_lock = threading.Lock()
_cache: Dict[str, Optional[ctypes.CDLL]] = {}
_build_failed = False


def _build() -> bool:
    global _build_failed
    if _build_failed:
        return False
    try:
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain, etc.
        logger.warning(
            "native build failed, using pure-Python fallbacks: %s", e)
        _build_failed = True
        return False


def load_library(so_name: str,
                 configure: Callable[[ctypes.CDLL], None]
                 ) -> Optional[ctypes.CDLL]:
    """Load ``native/<so_name>``, building on first use. Returns None if
    the library cannot be built/loaded (callers fall back to Python)."""
    with _lock:
        if so_name in _cache:
            return _cache[so_name]
        path = NATIVE_DIR / so_name
        lib: Optional[ctypes.CDLL] = None
        if path.exists() or (_build() and path.exists()):
            try:
                lib = ctypes.CDLL(str(path))
                configure(lib)
            except Exception as e:
                logger.warning("failed to load %s: %s", so_name, e)
                lib = None
        _cache[so_name] = lib
        return lib
