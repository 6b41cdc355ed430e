"""Logging with pluggable callback + levels — ggml_log_set analogue.

ref: include/ggml.h:589-596 (levels NONE/DEBUG/INFO/WARN/ERROR/CONT),
ggml_log_set src/ggml.c:7065 (global callback, default stderr).
"""
from __future__ import annotations

import enum
import os
import sys
import time
from typing import Callable


class LogLevel(enum.IntEnum):
    NONE = 0
    DEBUG = 1
    INFO = 2
    WARN = 3
    ERROR = 4


_callback: Callable[[LogLevel, str], None] | None = None
_min_level = LogLevel[os.environ.get("GGML_TPU_LOG_LEVEL", "INFO").upper()] \
    if os.environ.get("GGML_TPU_LOG_LEVEL", "INFO").upper() in LogLevel.__members__ \
    else LogLevel.INFO


def log_set(callback: Callable[[LogLevel, str], None] | None):
    """Install a global log callback (None restores stderr default)."""
    global _callback
    _callback = callback


def set_level(level: LogLevel):
    global _min_level
    _min_level = level


def _emit(level: LogLevel, msg: str):
    if level < _min_level:
        return
    if _callback is not None:
        _callback(level, msg)
    else:
        ts = time.strftime("%H:%M:%S")
        print(f"[{ts}] {level.name:5s} {msg}", file=sys.stderr)


def debug(msg: str):
    _emit(LogLevel.DEBUG, msg)


def info(msg: str):
    _emit(LogLevel.INFO, msg)


def warn(msg: str):
    _emit(LogLevel.WARN, msg)


def error(msg: str):
    _emit(LogLevel.ERROR, msg)
