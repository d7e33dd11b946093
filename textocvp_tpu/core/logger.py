"""
Per-experiment logging: a lightweight tee logger writing ``logs.txt`` inside
the experiment directory (reference lib/logger.py:64-156), without the global
fail-fast exception trapping — errors propagate normally, and structured
tracing is handled by ``jax.profiler`` instead.
"""

from __future__ import annotations

import datetime
import os
import sys
import traceback
from pathlib import Path

_LOGGER: "Logger | None" = None


class Logger:
    """Tee logger writing timestamped messages to ``<exp_path>/logs.txt``."""

    def __init__(self, exp_path: str | os.PathLike):
        self.exp_path = Path(exp_path)
        self.file = self.exp_path / "logs.txt"
        self.exp_path.mkdir(parents=True, exist_ok=True)
        global _LOGGER
        _LOGGER = self

    def log(self, message: str, typ: str = "info") -> None:
        ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        line = f"{ts}    {typ.upper()}: {message}"
        with open(self.file, "a") as f:
            f.write(line + "\n")

    def log_exception(self, e: BaseException) -> None:
        self.log("".join(traceback.format_exception(type(e), e, e.__traceback__)), "error")

    def log_params(self, params: dict) -> None:
        import json

        self.log("experiment params:\n" + json.dumps(params, indent=2, default=str))


def print_(message: str, typ: str = "info") -> None:
    """Print to stdout and, if a Logger is active, to the experiment log."""
    print(message)
    if _LOGGER is not None:
        _LOGGER.log(message, typ)
    sys.stdout.flush()


def log_info(message: str) -> None:
    if _LOGGER is not None:
        _LOGGER.log(message, "info")
