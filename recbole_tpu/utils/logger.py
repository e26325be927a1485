"""Colored console + per-run file logging.

Parity target: reference init_logger (recbole/utils/logger.py:31-81) — console with
colors, per-run log file named <Model>-<time>.log under ./log/.
"""

import logging
import os
from datetime import datetime

_COLORS = {
    "DEBUG": "\033[36m",
    "INFO": "\033[32m",
    "WARNING": "\033[33m",
    "ERROR": "\033[31m",
    "CRITICAL": "\033[1;31m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelname)
        if color and os.isatty(2):
            return f"{color}{msg}{_RESET}"
        return msg


def get_local_time() -> str:
    return datetime.now().strftime("%b-%d-%Y_%H-%M-%S")


def init_logger(config) -> logging.Logger:
    """Configure the root 'recbole_tpu' logger: colored stderr + a run logfile."""
    log_dir = config["log_dir"] if "log_dir" in config else "./log"
    os.makedirs(log_dir, exist_ok=True)
    logfile = os.path.join(log_dir, f"{config['model']}-{get_local_time()}.log")

    logger = logging.getLogger("recbole_tpu")
    logger.setLevel(getattr(logging, str(config["state"] or "INFO").upper(), logging.INFO))
    logger.handlers.clear()

    fmt = "%(asctime)s %(levelname)s %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(_ColorFormatter(fmt, datefmt="%H:%M:%S"))
    logger.addHandler(sh)

    fh = logging.FileHandler(logfile, encoding="utf-8")
    fh.setFormatter(logging.Formatter(fmt))
    logger.addHandler(fh)
    logger.propagate = False
    return logger


def get_logger() -> logging.Logger:
    return logging.getLogger("recbole_tpu")


def set_color(text: str, color: str) -> str:
    codes = {
        "black": 30, "red": 31, "green": 32, "yellow": 33,
        "blue": 34, "pink": 35, "cyan": 36, "white": 37,
    }
    return f"\033[1;{codes.get(color, 37)}m{text}\033[0m"
