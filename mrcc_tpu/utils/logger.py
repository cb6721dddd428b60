"""Rotating-file logger (utils/logger.py parity, minus the singleton lock —
python logging is already process-safe for our use)."""

from __future__ import annotations

import logging
import logging.handlers
import os

_LOGGERS = {}


def get_logger(name="mrcc_tpu", log_path=None):
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("[%(asctime)s][%(levelname)s] %(message)s")
    if not logger.handlers:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            fh = logging.handlers.RotatingFileHandler(
                log_path, maxBytes=10 * 1024 * 1024, backupCount=3)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger
