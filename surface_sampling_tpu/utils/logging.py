"""Logger factory and silencing context (mcmc/utils/logging.py analog)."""

from __future__ import annotations

import logging
from pathlib import Path


def setup_logger(
    name: str,
    log_file: str | Path | None = None,
    level: int = logging.INFO,
) -> logging.Logger:
    """File+console logger with the uniform '%H:%M:%S - name | LEVEL: msg'
    format (mcmc/utils/logging.py:6-40)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s - %(name)s | %(levelname)s: %(message)s", "%H:%M:%S")
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SilenceLogger:
    """Context manager muting all logging below CRITICAL
    (mcmc/utils/logging.py:43-53)."""

    def __enter__(self):
        logging.disable(logging.CRITICAL)
        return self

    def __exit__(self, *exc):
        logging.disable(logging.NOTSET)
        return False
