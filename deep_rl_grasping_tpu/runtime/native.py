"""ctypes bindings for the native runtime library (logger.cc).

Builds on demand with the repo's Makefile (g++ is in the base image; no
pip/pybind11 needed). Falls back gracefully — callers check for ImportError.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgrasplog.so")


def _ensure_built():
    src = os.path.join(_DIR, "logger.cc")
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return
    subprocess.run(["make", "-C", _DIR, "-s"], check=True)


_ensure_built()
_lib = ctypes.CDLL(_LIB_PATH)
_lib.log_writer_open.restype = ctypes.c_void_p
_lib.log_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
_lib.log_writer_write.restype = ctypes.c_int
_lib.log_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
_lib.log_writer_dropped.restype = ctypes.c_uint64
_lib.log_writer_dropped.argtypes = [ctypes.c_void_p]
_lib.log_writer_close.argtypes = [ctypes.c_void_p]


class AsyncCsvWriter:
    """Non-blocking line writer backed by the C++ flusher thread."""

    def __init__(self, path, header=""):
        self._h = _lib.log_writer_open(
            os.fsencode(path), header.encode("utf-8")
        )
        if not self._h:
            raise OSError(f"cannot open {path}")

    def write(self, line: str):
        return _lib.log_writer_write(self._h, line.encode("utf-8"))

    @property
    def dropped(self):
        return int(_lib.log_writer_dropped(self._h))

    def close(self):
        if self._h:
            _lib.log_writer_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
