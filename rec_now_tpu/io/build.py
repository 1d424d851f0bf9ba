"""Build-on-first-import harness for the native IO library.

Compiles ``native/criteo_parser.cpp`` into ``_recio.<arch>.so`` next to
the sources with ``g++ -O3`` and caches by source mtime.  The cache file
is keyed by host machine/platform so a source tree shared across
heterogeneous hosts (NFS mounts, baked container images) never loads an
ISA-incompatible binary (the build uses ``-march=native``).  No
pybind11/setuptools dependency: the library exposes a plain C ABI and is
loaded with ctypes.  If no compiler is available the caller falls back
to the pure-Python parser (rec_now_tpu/io/criteo.py), which is
semantics-identical but ~100x slower; a one-time warning announces the
fallback so the slowdown is never silent.
"""
from __future__ import annotations

import ctypes
import os
import platform
import subprocess
import warnings
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "criteo_parser.cpp")
_ARCH = "{}-{}".format(platform.machine() or "unknown",
                       platform.system().lower() or "unknown")
_LIB = os.path.join(_HERE, "native", f"_recio.{_ARCH}.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    try:
        if (os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return True
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-march=native", "-o", _LIB, _SRC, "-lpthread"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _warn_fallback(why: str) -> None:
    warnings.warn(
        f"native Criteo parser unavailable ({why}); falling back to the "
        "pure-Python parser (~100x slower)", RuntimeWarning,
        stacklevel=3)


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _compile():
        _warn_fallback("compile failed or no compiler")
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        _warn_fallback(f"dlopen failed: {e}")
        return None
    lib.rn_parse_criteo.restype = ctypes.c_int64
    lib.rn_parse_criteo.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,          # buf, len
        ctypes.c_int32, ctypes.c_int32,           # num_dense, num_sparse
        ctypes.c_int64,                           # rows_per_field
        ctypes.c_int32, ctypes.c_int64,           # group_field, num_groups
        ctypes.c_int32, ctypes.c_int64,           # num_threads, max_rows
        ctypes.c_void_p, ctypes.c_void_p,         # dense, ids
        ctypes.c_void_p, ctypes.c_void_p,         # labels, group_ids
    ]
    lib.rn_fnv1a_mod.restype = ctypes.c_int64
    lib.rn_fnv1a_mod.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                 ctypes.c_int64]
    _lib = lib
    return _lib
