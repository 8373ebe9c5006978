"""File + console logging and environment reporting.

ref: pMCTF/utils/logger.py:8-93.
"""

from __future__ import annotations

import logging
import sys

_initialized = {}


def get_root_logger(logger_name: str = "pmctf_tpu",
                    log_level: int = logging.INFO,
                    log_file: str | None = None) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized:
        return logger
    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        fh = logging.FileHandler(log_file, "w")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(log_level)
    logger.propagate = False
    _initialized[logger_name] = True
    return logger


def get_env_info() -> str:
    import jax
    lines = [
        f"jax {jax.__version__}",
        f"devices: {jax.devices()}",
        f"default backend: {jax.default_backend()}",
    ]
    return "\n\t".join(["Environment:"] + lines)


def dict2str(opt: dict, indent: int = 1) -> str:
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * indent * 2 + f"{k}:\n" + dict2str(v, indent + 1)
        else:
            msg += " " * indent * 2 + f"{k}: {v}\n"
    return msg
