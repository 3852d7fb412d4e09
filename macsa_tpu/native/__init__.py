"""ctypes bindings for the native host image pipeline (image_pipe.cpp).

The reference's data path rides external native code (torchvision's C++
decode/transforms, torch's C++ DataLoader core); this module is the
framework's own native equivalent: libjpeg/libpng decode + antialiased
resize + ImageNet normalization compiled from `image_pipe.cpp`, called with
the GIL released so loader threads scale on multi-core hosts.

Usage: `ensure_built()` compiles the shared object on first use (cached
beside the source, rebuilt when the source is newer); every public function
degrades to `None`/fallback if the toolchain or libraries are missing, and
`MACSA_NATIVE_IMAGES=0` disables the native path entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_pipe.cpp")
_SO = os.path.join(_DIR, "_image_pipe.so")
_BUILD_CMD = [
    "g++", "-O3", "-fPIC", "-shared", "-fopenmp", _SRC, "-o", _SO,
    "-ljpeg", "-lpng",
]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _enabled() -> bool:
    return os.environ.get("MACSA_NATIVE_IMAGES", "1") != "0"


def ensure_built(force: bool = False) -> bool:
    """Compile the shared object if missing/stale. True on success.

    Concurrency-safe across processes (the 2-process `jax.distributed` test,
    parallel jobs sharing a checkout): g++ writes to a pid-unique temp path
    which is atomically `os.replace`d into place, so a reader can never dlopen
    a half-written .so — and a torn file can't end up with a fresh mtime that
    marks it permanently 'up to date'.  Any failure (missing source, missing
    toolchain, unreadable mtimes) returns False and the caller degrades to
    the PIL path.
    """
    try:
        if not force and os.path.exists(_SO) and (
                os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return True
        tmp = f"{_SO}.build.{os.getpid()}"
        cmd = list(_BUILD_CMD)
        cmd[cmd.index(_SO)] = tmp
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            os.replace(tmp, _SO)
            return True
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    intp = ctypes.POINTER(ctypes.c_int)
    lib.ip_decode.restype = u8p
    lib.ip_decode.argtypes = [ctypes.c_char_p, intp, intp]
    lib.ip_free.restype = None
    lib.ip_free.argtypes = [u8p]
    lib.ip_resize_u8.restype = None
    lib.ip_resize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
                                 ctypes.c_int, ctypes.c_int]
    lib.ip_normalize_f32.restype = None
    lib.ip_normalize_f32.argtypes = [u8p, ctypes.c_longlong, f32p, f32p, f32p]
    lib.ip_resize_normalize_f32.restype = None
    lib.ip_resize_normalize_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """The bound CDLL, building it on first call; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _enabled():
            return None
        if not ensure_built():
            return None
        try:
            _lib = _bind(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode(path: str) -> Optional[np.ndarray]:
    """Decode JPEG/PNG -> u8 HWC RGB array; None on failure or when the
    native library is unavailable (caller falls back to PIL)."""
    lib = load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    buf = lib.ip_decode(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if not buf:
        return None
    try:
        n = h.value * w.value * 3
        out = np.ctypeslib.as_array(buf, shape=(n,)).reshape(
            h.value, w.value, 3).copy()
    finally:
        lib.ip_free(buf)
    return out


def resize_u8(img: np.ndarray, size: int) -> Optional[np.ndarray]:
    """Antialiased triangle resize, u8 HWC -> u8 [size, size, 3]."""
    lib = load()
    if lib is None or img.ndim != 3 or img.shape[2] != 3:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((size, size, 3), np.uint8)
    lib.ip_resize_u8(_u8p(img), img.shape[0], img.shape[1], _u8p(out), size,
                     size)
    return out


def resize_normalize(img: np.ndarray, size: int, mean: np.ndarray,
                     std: np.ndarray) -> Optional[np.ndarray]:
    """Fused resize + (x/255 - mean)/std, u8 HWC -> f32 [size, size, 3]."""
    lib = load()
    if lib is None or img.ndim != 3 or img.shape[2] != 3:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    inv_std = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    lib.ip_resize_normalize_f32(_u8p(img), img.shape[0], img.shape[1],
                                _f32p(out), size, size, _f32p(mean),
                                _f32p(inv_std))
    return out
