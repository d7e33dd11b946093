"""
Per-experiment logging: a lightweight tee logger writing ``logs.txt`` inside
the experiment directory (reference lib/logger.py:64-156), plus the
method-call tracing decorators (``log_function`` / ``for_all_methods``,
reference lib/logger.py:13-44). One deliberate difference: the reference
traps exceptions and ``exit()``s — here exceptions are logged to the
experiment log and then RE-RAISED, so callers (and the emergency-save path)
see them normally.
"""

from __future__ import annotations

import datetime
import functools
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

    # Multi-process runs: every process logs to the SAME logs.txt on a shared
    # filesystem; set by maybe_initialize_distributed so only process 0 writes
    # (console output is unaffected). Class-level so it also covers a Logger
    # constructed before jax.distributed comes up.
    file_writes_enabled = True

    def log(self, message: str, typ: str = "info") -> None:
        if not Logger.file_writes_enabled:
            return
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


def log_function(func):
    """Method-call tracing (reference lib/logger.py:13-32): logs
    ``Calling: <name>...`` on entry (public methods only — private helpers can
    run per-iteration) and logs any exception into the experiment log before
    re-raising it."""

    @functools.wraps(func)
    def traced(*args, **kwargs):
        if _LOGGER is not None and not func.__name__.startswith("_"):
            _LOGGER.log(f"Calling: {func.__name__}...")
        try:
            return func(*args, **kwargs)
        except Exception as e:
            if _LOGGER is not None:
                _LOGGER.log_exception(e)
            raise

    return traced


def for_all_methods(decorator):
    """Class decorator applying ``decorator`` to every method
    (reference lib/logger.py:35-44). static/class methods are re-wrapped to
    preserve their binding behavior."""

    def decorate(cls):
        for attr, val in list(cls.__dict__.items()):
            if attr.startswith("__"):
                continue
            if isinstance(val, staticmethod):
                setattr(cls, attr, staticmethod(decorator(val.__func__)))
            elif isinstance(val, classmethod):
                setattr(cls, attr, classmethod(decorator(val.__func__)))
            elif callable(val):
                setattr(cls, attr, decorator(val))
        return cls

    return decorate
