"""Minimal structured logger (loguru-compatible surface for this codebase).

The reference logs via loguru at INFO to stderr (src/train_nerf.py:89-90).
loguru is not in this image, so a tiny stand-in with the same call surface
(`logger.info/debug/warning/error`, `logger.remove`, `logger.add`) is provided;
if loguru is importable it is used directly.
"""

from __future__ import annotations

import sys
import time

try:
    from loguru import logger  # type: ignore  # pragma: no cover
except ImportError:
    class _Logger:
        _LEVELS = {"DEBUG": 10, "INFO": 20, "WARNING": 30, "ERROR": 40}

        def __init__(self):
            self._level = 20
            self._stream = sys.stderr

        def remove(self, *args, **kwargs):
            pass

        def add(self, sink, level="INFO", **kwargs):
            if hasattr(sink, "write"):
                self._stream = sink
            self._level = self._LEVELS.get(level, 20)

        def _log(self, level, message):
            if self._LEVELS[level] >= self._level:
                ts = time.strftime("%Y-%m-%d %H:%M:%S")
                print(f"{ts} | {level:<7} | {message}", file=self._stream)

        def debug(self, message):
            self._log("DEBUG", message)

        def info(self, message):
            self._log("INFO", message)

        def warning(self, message):
            self._log("WARNING", message)

        def error(self, message):
            self._log("ERROR", message)

    logger = _Logger()
