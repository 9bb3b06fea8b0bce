"""Per-rank logger, parity with reference ``internlm/utils/logger.py``."""

from __future__ import annotations

import logging
import sys

LOGGER_NAME = "internevo_tpu"
LOGGER_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"

_initialized = False


def get_logger(name: str = LOGGER_NAME, level: int = logging.INFO) -> logging.Logger:
    global _initialized
    if not name.startswith(LOGGER_NAME):
        name = f"{LOGGER_NAME}.{name}"  # route through the package handler
    logger = logging.getLogger(name)
    if not _initialized:
        root = logging.getLogger(LOGGER_NAME)
        root.setLevel(level)
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(LOGGER_FORMAT))
        root.addHandler(handler)
        root.propagate = False
        _initialized = True
    return logger
