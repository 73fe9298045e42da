"""Structured logging for the pipeline.

The reference glogs every fallback and failure path (LOG(INFO/WARNING)
throughout src/Tracking.cc:396,1091,1173 etc.); here one module logger
covers the same role, off by default, enabled with YGZ_LOG=debug|info or
programmatically via enable(). Hot-path call sites only pay for string
formatting when the level is active.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("ygz_tpu")

_LEVELS = {"debug": logging.DEBUG, "info": logging.INFO,
           "warning": logging.WARNING, "error": logging.ERROR}


def _init():
    lvl = os.environ.get("YGZ_LOG", "").lower()
    if lvl in _LEVELS:
        enable(lvl)
    else:
        logger.addHandler(logging.NullHandler())


def enable(level: str = "info"):
    logger.setLevel(_LEVELS[level])
    if not any(isinstance(h, logging.StreamHandler)
               for h in logger.handlers):
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[ygz %(levelname).1s] %(message)s"))
        logger.addHandler(h)


_init()
