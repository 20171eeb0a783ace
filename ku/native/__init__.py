"""Native (C++) host-runtime components, bound via ctypes.

:class:`NativeImagePipeline` wraps the threaded C++ preprocessing /
prefetch loader in ``loader.cpp`` (see its header comment for the design
and the reference-pipeline mapping). The shared object is compiled with
g++ on first use and cached next to the source; if no toolchain is
available, ``NativeImagePipeline.available()`` returns False and callers
fall back to the Python/JAX path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "_loader.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> None:
    base = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    # Prefer a libpng build (in-worker PNG decode via submit_file); fall
    # back to a decode-less build when libpng/headers are absent.
    try:
        subprocess.run(base + ["-DKU_HAS_PNG", "-lpng", "-lz"], check=True,
                       capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.ku_loader_create.restype = ctypes.c_void_p
            lib.ku_loader_create.argtypes = [ctypes.c_int] * 5
            lib.ku_loader_submit.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.ku_loader_get.restype = ctypes.c_int
            lib.ku_loader_get.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
            ]
            lib.ku_loader_pending.restype = ctypes.c_long
            lib.ku_loader_pending.argtypes = [ctypes.c_void_p]
            lib.ku_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.ku_loader_submit_file.restype = ctypes.c_int
            lib.ku_loader_submit_file.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p
            ]
            lib.ku_loader_errors.restype = ctypes.c_long
            lib.ku_loader_errors.argtypes = [ctypes.c_void_p]
            lib.ku_loader_has_png.restype = ctypes.c_int
            lib.ku_loader_has_png.argtypes = []
            _lib = lib
        except Exception as e:  # no toolchain / build failure → fallback
            _build_error = str(e)
        return _lib


class NativeImagePipeline:
    """Threaded native resize+normalize+prefetch (C++ loader.cpp).

    >>> pipe = NativeImagePipeline(out_h=128, out_w=128)
    >>> for img in raw_uint8_images: pipe.submit(img)
    >>> batch = pipe.get_batch(len(raw_uint8_images))  # (N,128,128,3) in [-1,1]
    """

    def __init__(self, out_h: int, out_w: int, channels: int = 3,
                 n_threads: int = 4, capacity: int = 64):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.out_h, self.out_w, self.channels = out_h, out_w, channels
        self._handle = lib.ku_loader_create(
            n_threads, capacity, out_h, out_w, channels
        )

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def submit(self, img: np.ndarray) -> None:
        """Enqueue one HWC uint8 image (any size/channels)."""
        img = np.ascontiguousarray(img, np.uint8)
        assert img.ndim == 3
        h, w, c = img.shape
        self._lib.ku_loader_submit(
            self._handle,
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        )

    def submit_file(self, path: str) -> None:
        """Enqueue a PNG FILE: read + libpng decode + resize all happen in
        the worker thread (no Python in the decode path). Requires a
        libpng build — check :meth:`supports_files`. A corrupt file
        produces a zeroed output (delivery order holds) and increments
        :meth:`errors`."""
        status = self._lib.ku_loader_submit_file(
            self._handle, os.fsencode(path)
        )
        if status != 0:
            raise RuntimeError("native loader built without libpng; "
                               "decode in Python and use submit()")

    def supports_files(self) -> bool:
        """True when the loader was built with libpng (submit_file works)."""
        return bool(self._lib.ku_loader_has_png())

    def errors(self) -> int:
        """Failed file decodes so far (each produced a zeroed output)."""
        return int(self._lib.ku_loader_errors(self._handle))

    def get(self) -> np.ndarray:
        """Blocking pop of one preprocessed (out_h, out_w, channels) f32
        image in [-1, 1]. Results are delivered in SUBMIT order (workers
        complete concurrently; the loader reorders by sequence id), so
        per-submit metadata such as labels stays paired. Raises if nothing
        was submitted (no deadlock on over-popping)."""
        out = np.empty((self.out_h, self.out_w, self.channels), np.float32)
        status = self._lib.ku_loader_get(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if status != 0:
            raise RuntimeError(
                "native loader: no result available (nothing pending or "
                "loader stopping)"
            )
        return out

    def get_batch(self, n: int) -> np.ndarray:
        return np.stack([self.get() for _ in range(n)])

    def pending(self) -> int:
        return int(self._lib.ku_loader_pending(self._handle))

    def close(self):
        if self._handle:
            self._lib.ku_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
