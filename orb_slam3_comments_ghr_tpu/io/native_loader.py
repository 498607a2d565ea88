"""ctypes bindings for the native prefetching image loader (native/slamio.cpp).

The library is built on demand (g++, one-time, cached); if the toolchain is
unavailable the loader transparently falls back to the Python decoder in
io.datasets — same interface, no prefetch."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_library():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        so = os.path.join(_native_dir(), "libslamio.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["sh", os.path.join(_native_dir(), "build.sh")],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _LIB = False
                return False
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _LIB = False
            return False
        lib.slamio_open.restype = ctypes.c_int64
        lib.slamio_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.slamio_next.restype = ctypes.c_int32
        lib.slamio_next.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.slamio_close.argtypes = [ctypes.c_int64]
        _LIB = lib
        return lib


class PrefetchLoader:
    """In-order prefetching image iterator over a list of file paths."""

    def __init__(self, paths, n_workers: int = 2, capacity: int = 8,
                 max_hw=(2048, 2048)):
        self.paths = list(paths)
        self.max_elems = max_hw[0] * max_hw[1]
        self._buf = np.empty(self.max_elems, np.float32)
        self._lib = _load_library()
        self._handle = None
        self._py_iter = None
        if self._lib:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = self._lib.slamio_open(
                arr, len(self.paths), n_workers, capacity
            )
        else:
            from . import datasets

            self._py_iter = (datasets.load_image(p) for p in self.paths)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        for _ in range(len(self.paths)):
            yield self.next()

    def next(self) -> np.ndarray:
        if self._py_iter is not None:
            return next(self._py_iter)
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        rc = self._lib.slamio_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.max_elems, ctypes.byref(h), ctypes.byref(w),
        )
        if rc == -1:
            raise StopIteration
        if rc == 0:
            raise IOError("native decode failed")
        return self._buf[: h.value * w.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle is not None and self._lib:
            self._lib.slamio_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
