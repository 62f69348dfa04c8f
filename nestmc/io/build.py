"""Build (and cache) the native ingest extension with the system toolchain.

No pybind11 in the image — the extension is a plain C-ABI shared object
loaded via ctypes. Built on first use into ``native/_build/`` and reused;
any failure falls back to the pure-numpy loader (nestmc/io/loaders.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_CACHED: dict = {}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def native_lib(rebuild: bool = False):
    """ctypes handle to the ingest library, or None if unavailable."""
    if "lib" in _CACHED and not rebuild:
        return _CACHED["lib"]
    root = _repo_root()
    src = os.path.join(root, "native", "ingest.cpp")
    if not os.path.exists(src):
        _CACHED["lib"] = None
        return None
    build_dir = os.path.join(root, "native", "_build")
    so = os.path.join(build_dir, "libnestmc_ingest.so")
    try:
        if rebuild or not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)
        ):
            os.makedirs(build_dir, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.nestmc_ingest_csv.restype = ctypes.c_int
        lib.nestmc_ingest_csv.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _CACHED["lib"] = lib
    except Exception:
        _CACHED["lib"] = None
    return _CACHED["lib"]
