"""ctypes bindings for the native runtime (loader.cc)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libautovc_runtime.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.avc_read_wavs.restype = ctypes.c_int64
    lib.avc_store_create.restype = ctypes.c_void_p
    lib.avc_store_load_npy.restype = ctypes.c_int64
    lib.avc_store_load_npy.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.avc_store_rows.restype = ctypes.c_int64
    lib.avc_store_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.avc_store_cols.restype = ctypes.c_int64
    lib.avc_store_cols.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.avc_store_destroy.argtypes = [ctypes.c_void_p]
    lib.avc_store_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.avc_store_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def read_wavs(paths: Sequence[str], max_len: int, threads: int = 8):
    """Decode 16-bit PCM WAVs in parallel -> (out (N, max_len) float32,
    lengths (N,) int64; 0 length = decode failure)."""
    lib = _load()
    assert lib is not None, "native runtime unavailable"
    n = len(paths)
    out = np.zeros((n, max_len), np.float32)
    lengths = np.zeros((n,), np.int64)
    ok = lib.avc_read_wavs(
        _paths_array(paths),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(max_len),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(threads),
    )
    return out, lengths, int(ok)


class FeatureStore:
    """Resident feature buffers + native batch packing (the TPU-native
    equivalent of the reference's fork+Manager RAM preloader,
    data_loader.py:26-36)."""

    def __init__(self):
        lib = _load()
        assert lib is not None, "native runtime unavailable"
        self._lib = lib
        self._store = lib.avc_store_create()

    def load_npy_batch(self, paths: Sequence[str], threads: int = 8) -> np.ndarray:
        n = len(paths)
        ids = np.zeros((n,), np.int64)
        self._lib.avc_store_load_npy_batch(
            ctypes.c_void_p(self._store),
            _paths_array(paths),
            ctypes.c_int64(n),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(threads),
        )
        return ids

    def view(self, idx: int) -> np.ndarray:
        """Zero-copy numpy view of a resident buffer (call after all loads)."""
        r, c = self.rows(idx), self.cols(idx)
        ptr = self._lib.avc_store_data(ctypes.c_void_p(self._store), ctypes.c_int64(idx))
        arr = np.ctypeslib.as_array(ptr, shape=(r, c))
        arr.flags.writeable = False
        return arr

    def rows(self, idx: int) -> int:
        return int(self._lib.avc_store_rows(ctypes.c_void_p(self._store), ctypes.c_int64(idx)))

    def cols(self, idx: int) -> int:
        return int(self._lib.avc_store_cols(ctypes.c_void_p(self._store), ctypes.c_int64(idx)))

    def pack(self, ids: np.ndarray, offsets: np.ndarray, len_crop: int, threads: int = 4):
        """Gather crops -> (B, len_crop, cols) float32 with zero right-pad."""
        ids = np.ascontiguousarray(ids, np.int64)
        offsets = np.ascontiguousarray(offsets, np.int64)
        b = ids.shape[0]
        cols = self.cols(int(ids[0]))
        out = np.empty((b, len_crop, cols), np.float32)
        self._lib.avc_store_pack(
            ctypes.c_void_p(self._store),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(b),
            ctypes.c_int64(len_crop),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(threads),
        )
        return out

    def __del__(self):
        store = getattr(self, "_store", None)
        lib = getattr(self, "_lib", None)
        if store and lib is not None:
            try:
                lib.avc_store_destroy(ctypes.c_void_p(store))
            except TypeError:  # interpreter shutdown already tore down ctypes
                pass
            self._store = None
