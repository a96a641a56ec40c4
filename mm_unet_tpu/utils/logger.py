"""Stdout/stderr tee to a log file (reference `src/utils.py:312-346` Logger)."""

from __future__ import annotations

import os
import sys
import time


class _Tee:
    def __init__(self, stream, fh):
        self.stream = stream
        self.fh = fh

    def write(self, data):
        self.stream.write(data)
        self.fh.write(data)

    def flush(self):
        self.stream.flush()
        self.fh.flush()


class Logger:
    """Tees stdout/stderr to `logs/<name><timestamp>/log.txt`."""

    def __init__(self, name: str, root: str = "logs"):
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        self.dir = os.path.join(root, f"{name}{stamp}")
        os.makedirs(self.dir, exist_ok=True)
        self.fh = open(os.path.join(self.dir, "log.txt"), "a")
        sys.stdout = _Tee(sys.__stdout__, self.fh)
        sys.stderr = _Tee(sys.__stderr__, self.fh)

    def close(self):
        sys.stdout = sys.__stdout__
        sys.stderr = sys.__stderr__
        self.fh.close()
