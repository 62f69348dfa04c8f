"""Dataset loaders: CSV -> RaggedData (segment representation).

CSV schema (headerless, numeric): ``group_id, y, x_1, ..., x_p`` with rows
contiguous per group. The native C++ parser (native/ingest.cpp, built on
first use) is ~1-2 orders of magnitude faster than the Python path on large
files; both produce identical arrays (tests/test_io.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

from nestmc.data import RaggedData


def _load_csv_python(path: str):
    raw = np.loadtxt(path, delimiter=",", dtype=np.float64, ndmin=2)
    if raw.shape[1] < 2:
        raise ValueError("CSV needs at least (group_id, y) columns")
    gid = raw[:, 0]
    # dense group ids in first-appearance order (contiguous blocks)
    change = np.empty(len(gid), dtype=bool)
    if len(gid):
        change[0] = True
        change[1:] = gid[1:] != gid[:-1]
    seg = np.cumsum(change) - 1
    y = raw[:, 1].astype(np.float32)
    x = raw[:, 2:].astype(np.float32) if raw.shape[1] > 2 else None
    return y, x, seg.astype(np.int32), int(seg[-1]) + 1 if len(seg) else 0


def _load_csv_native(path: str):
    from nestmc.io.build import native_lib

    lib = native_lib()
    if lib is None:
        return None
    n_rows = ctypes.c_int64()
    n_cols = ctypes.c_int64()
    n_groups = ctypes.c_int64()
    err_line = ctypes.c_int64()
    rc = lib.nestmc_ingest_csv(
        path.encode(), ctypes.byref(n_rows), ctypes.byref(n_cols),
        ctypes.byref(n_groups), None, None, None, ctypes.byref(err_line),
    )
    if rc == -1:
        raise FileNotFoundError(path)
    if rc != 0:
        raise ValueError(
            f"CSV parse error (code {rc}) at line {err_line.value} in {path}"
        )
    R, C = n_rows.value, n_cols.value
    p = C - 2
    y = np.empty(R, np.float32)
    x = np.empty((R, p), np.float32) if p else np.empty((R, 0), np.float32)
    seg = np.empty(R, np.int32)
    rc = lib.nestmc_ingest_csv(
        path.encode(), ctypes.byref(n_rows), ctypes.byref(n_cols),
        ctypes.byref(n_groups),
        y.ctypes.data_as(ctypes.c_void_p),
        x.ctypes.data_as(ctypes.c_void_p),
        seg.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(err_line),
    )
    if rc != 0:
        raise ValueError(f"CSV parse error on fill pass (code {rc})")
    return y, (x if p else None), seg, n_groups.value


def load_csv(path: str, native: bool | None = None) -> RaggedData:
    """Load ``group_id, y, x...`` CSV into RaggedData.

    native: True = require the C++ parser; False = force the Python path;
    None (default) = native if buildable, else Python.
    """
    out = None
    if native is not False:
        try:
            out = _load_csv_native(path)
        except (FileNotFoundError, ValueError):
            raise
        except Exception:
            out = None
        if out is None and native is True:
            raise RuntimeError("native ingest unavailable (g++ build failed)")
    if out is None:
        out = _load_csv_python(path)
    y, x, seg, num_groups = out
    import jax.numpy as jnp

    return RaggedData(
        y=jnp.asarray(y),
        segment_ids=jnp.asarray(seg),
        num_groups=num_groups,
        x=None if x is None else jnp.asarray(x),
    )
