"""Minimal structured logging: one host-side line per scan segment.

The hot loop never logs (no host round-trips); observability is per-segment
(SURVEY.md section 5.5): sweeps done, sweeps/sec, per-block acceptance.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


def get_logger(name: str = "nestmc", level: int | str = logging.INFO):
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.propagate = False
    logger.setLevel(level)
    return logger
