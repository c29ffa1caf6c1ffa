"""Console + file logger, rank-0 aware (reference: geotransformer/engine/
logger.py:6-55)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import jax


def create_logger(log_file: Optional[str] = None, name: str = "rdmnet_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    for h in logger.handlers:
        h.close()  # don't leak fds of previous FileHandlers
    logger.handlers.clear()
    logger.propagate = False

    is_main = jax.process_index() == 0
    if is_main:
        console = logging.StreamHandler(sys.stdout)
        console.setLevel(logging.INFO)
        console.setFormatter(logging.Formatter("[%(asctime)s] %(message)s", "%H:%M:%S"))
        logger.addHandler(console)
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(
                logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s")
            )
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
