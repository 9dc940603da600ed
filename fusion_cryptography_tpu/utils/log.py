"""Minimal structured logging (stdlib logging, no loguru dependency —
the reference pulls loguru only for its benchmark harness, benchmarks.py:8)."""
from __future__ import annotations

import logging
import os


def get_logger(name: str = "fusion_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(h)
        logger.setLevel(os.environ.get("FUSION_TPU_LOG", "WARNING").upper())
    return logger
