"""ctypes binding for the native clip decoder (native/decoder.cpp).

Replaces the reference's native decode dependencies (decord/OpenCV C++
paths, SURVEY.md §2c) with a first-party C++ library: ZIP central-directory
caching + threaded inflate/JPEG decode straight into one contiguous
(N, H, W, 3) uint8 buffer.  Falls back transparently to the python/cv2
zipreader when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libstt_decoder.so")
_lib = None


def build_native(force: bool = False) -> bool:
    """Compile the shared library (idempotent).  Returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.stt_open_zip.restype = ctypes.c_void_p
    lib.stt_open_zip.argtypes = [ctypes.c_char_p]
    lib.stt_close_zip.argtypes = [ctypes.c_void_p]
    lib.stt_zip_num_entries.argtypes = [ctypes.c_void_p]
    lib.stt_zip_num_entries.restype = ctypes.c_int
    lib.stt_zip_entry_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.stt_zip_entry_name.restype = ctypes.c_char_p
    lib.stt_probe.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.stt_probe.restype = ctypes.c_int
    lib.stt_decode_frames.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.stt_decode_frames.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeZipDecoder:
    """Per-zip handle with cached central directory; thread-pool decode."""

    def __init__(self, zip_path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native decoder not built; run `make -C native`")
        self._lib = lib
        self._handle = lib.stt_open_zip(zip_path.encode())
        if not self._handle:
            raise IOError(f"cannot open zip {zip_path}")
        self._dims: Optional[tuple] = None
        self.zip_path = zip_path

    def close(self):
        if self._handle:
            self._lib.stt_close_zip(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def entry_names(self) -> List[str]:
        n = self._lib.stt_zip_num_entries(self._handle)
        return [self._lib.stt_zip_entry_name(self._handle, i).decode()
                for i in range(n)]

    def probe(self, name: str) -> tuple:
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.stt_probe(self._handle, name.encode(),
                                 ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise IOError(f"probe failed for {name} in {self.zip_path}")
        return h.value, w.value

    def decode(self, names: Sequence[str],
               hw: Optional[tuple] = None) -> np.ndarray:
        """-> (len(names), H, W, 3) uint8 RGB."""
        if hw is None:
            if self._dims is None:
                self._dims = self.probe(names[0])
            hw = self._dims
        h, w = hw
        out = np.empty((len(names), h, w, 3), np.uint8)
        arr = (ctypes.c_char_p * len(names))(
            *[n.encode() for n in names])
        rc = self._lib.stt_decode_frames(
            self._handle, arr, len(names),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
        if rc != 0:
            raise IOError(
                f"{rc} frames failed to decode from {self.zip_path}")
        return out


_DECODER_CACHE: dict = {}
_CACHE_LIMIT = 64


def enabled() -> bool:
    """The native path is opt-in (SIMPLE_TAD_NATIVE_DECODER=1): on
    single-core hosts (this image has nproc=1) cv2's bundled
    libjpeg-turbo 3.x outdecodes the system libjpeg62-turbo 2.1 that the
    shared library links, so python+cv2 stays the default there.  On
    multi-core hosts the C++ pool + cached zip directory wins."""
    v = os.environ.get("SIMPLE_TAD_NATIVE_DECODER")
    if v is not None:
        return v not in ("0", "false", "")
    return (os.cpu_count() or 1) >= 4


def decode_zip_frames_native(zip_path: str, names: Sequence[str]
                             ) -> Optional[np.ndarray]:
    """Fast path for simple_tad_tpu.data.zipreader: returns frames or None
    when the native lib is unavailable / entries aren't uniform JPEG."""
    if not available() or not enabled():
        return None
    try:
        dec = _DECODER_CACHE.get(zip_path)
        if dec is None:
            if len(_DECODER_CACHE) >= _CACHE_LIMIT:
                _DECODER_CACHE.pop(next(iter(_DECODER_CACHE))).close()
            dec = NativeZipDecoder(zip_path)
            _DECODER_CACHE[zip_path] = dec
        return dec.decode(names)
    except Exception:
        return None
