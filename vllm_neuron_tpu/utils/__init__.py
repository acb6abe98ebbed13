# SPDX-License-Identifier: Apache-2.0
"""Small shared utilities."""
from __future__ import annotations

import logging
import os


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m``."""
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def init_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers and not logging.getLogger().handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter(
                "%(levelname)s %(asctime)s [%(name)s] %(message)s",
                datefmt="%H:%M:%S",
            ))
        logger.addHandler(handler)
    level = os.environ.get("TPU_INFER_LOG_LEVEL", "INFO").upper()
    logger.setLevel(level)
    return logger
