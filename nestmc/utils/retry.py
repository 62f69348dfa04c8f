"""Retry helper for transient backend failures.

The remote-TPU compile service occasionally drops a request mid-flight
(HTTP body truncation, 500s under load). Compilation is deterministic and
side-effect-free, so retrying is always safe; real errors (OOM, lowering
failures) reproduce identically and surface after the retry budget.
"""

from __future__ import annotations

import time

from nestmc.utils.logging import get_logger

log = get_logger()

_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "Connection reset",
    "Deadline",
    "UNAVAILABLE",
)


def is_transient(err: Exception) -> bool:
    msg = str(err)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def with_transient_retry(fn, *args, attempts: int = 3, backoff_s: float = 2.0,
                         **kwargs):
    """Call fn(*args, **kwargs), retrying transient backend errors."""
    for attempt in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            if attempt + 1 >= attempts or not is_transient(e):
                raise
            log.warning(
                "transient backend error (attempt %d/%d): %s — retrying",
                attempt + 1, attempts, str(e)[:200],
            )
            time.sleep(backoff_s * (attempt + 1))
    raise AssertionError("unreachable")
