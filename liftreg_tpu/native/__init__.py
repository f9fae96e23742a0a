"""Native codec bindings (ctypes) with build-on-first-use and a pure-numpy
fallback.

Replaces the reference's blosc in-RAM compression
(``dataset/Registration2D3DDataset.py:93-121``) with a C++ byte-shuffle +
deflate codec (``codec.cpp``). If no compiler is available the numpy/zlib
fallback provides identical on-wire format (shuffle is a transpose).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import zlib

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libliftregcodec.so")
_LIB = None


def _build():
    src = os.path.join(_HERE, "codec.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", _SO, "-lz"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                   os.path.getmtime(os.path.join(_HERE, "codec.cpp"))):
        try:
            _build()
        except Exception:  # noqa: BLE001 — no compiler: fallback stays
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.lrc_max_compressed_size.restype = ctypes.c_size_t
    lib.lrc_max_compressed_size.argtypes = [ctypes.c_size_t]
    lib.lrc_compress.restype = ctypes.c_size_t
    lib.lrc_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_size_t]
    lib.lrc_decompress.restype = ctypes.c_size_t
    lib.lrc_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_size_t]
    _LIB = lib
    return lib


def native_available():
    return _load() is not None


def pack_array(arr, level=5):
    """Compress a numpy array -> (header dict, bytes)."""
    arr = np.ascontiguousarray(arr)
    meta = {"shape": arr.shape, "dtype": str(arr.dtype)}
    raw = arr.tobytes()
    elem = arr.dtype.itemsize
    lib = _load()
    if lib is not None:
        cap = lib.lrc_max_compressed_size(len(raw))
        out = ctypes.create_string_buffer(cap)
        n = lib.lrc_compress(raw, len(raw), elem, level, out, cap)
        if n:
            return meta, out.raw[:n]
    # fallback: numpy byte shuffle + zlib (same format)
    view = np.frombuffer(raw, np.uint8).reshape(-1, elem)
    shuffled = np.ascontiguousarray(view.T).tobytes()
    return meta, zlib.compress(shuffled, level)


def unpack_array(meta, payload):
    dtype = np.dtype(meta["dtype"])
    shape = tuple(meta["shape"])
    nbytes = int(np.prod(shape)) * dtype.itemsize
    elem = dtype.itemsize
    lib = _load()
    if lib is not None:
        out = ctypes.create_string_buffer(nbytes)
        n = lib.lrc_decompress(payload, len(payload), out, nbytes, elem)
        if n == nbytes:
            return np.frombuffer(out.raw, dtype).reshape(shape).copy()
    shuffled = np.frombuffer(zlib.decompress(payload), np.uint8)
    view = shuffled.reshape(elem, -1).T
    return np.ascontiguousarray(view).view(dtype).reshape(shape).copy()
