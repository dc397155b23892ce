"""ctypes bindings for the C++ ingest library (with auto-build + fallback).

``lib()`` loads (building on first use) libcmda_ingest.so; the wrappers
expose numpy-in / numpy-out versions of the host hot ops:
  * grayscale(rgb_u8)           PIL-exact ITU-R 601-2
  * voxel_grid(t, x, y, p, ...) trilinear event splat
  * events_norm(grid, clip)     standardize + per-sign renorm (in place copy)
  * isr(gray, params, dir)      the Image Motion-Extractor
  * voxel_batch(...)            threaded batched splat+norm

All are golden-tested against the numpy twins in cmda_tpu/data (which are
themselves tested against the jnp device ops). If the toolchain is missing,
``available()`` returns False and callers fall back to the numpy twins.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(HERE, "libcmda_ingest.so")

_lib = None
_tried = False

DIRECTION_IDS = {"leftdown": 0, "leftup": 1, "rightdown": 2, "rightup": 3,
                 "all": 4}


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(LIB_PATH):
        try:
            from .build import build
            build(verbose=False)
        except Exception:
            return None
    try:
        L = ctypes.CDLL(LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    L.cmda_grayscale.argtypes = [u8p, ctypes.c_int64, f32p]
    L.cmda_voxel_grid.argtypes = [f32p, f32p, f32p, f32p, ctypes.c_int64,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
    L.cmda_events_norm.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                   ctypes.c_float]
    L.cmda_isr.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                           ctypes.c_float, ctypes.c_float, ctypes.c_float,
                           ctypes.c_int, ctypes.c_int, f32p]
    L.cmda_voxel_batch.argtypes = [f32p, f32p, f32p, f32p, i64p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_float, f32p]
    L.cmda_inflate.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
    L.cmda_inflate.restype = ctypes.c_int64
    L.cmda_unshuffle.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, u8p]
    L.cmda_inflate_batch.argtypes = [u8p, i64p, ctypes.c_int, ctypes.c_int64,
                                     ctypes.c_int, ctypes.c_int, u8p]
    L.cmda_inflate_batch.restype = ctypes.c_int
    if hasattr(L, "cmda_png_decode"):
        L.cmda_png_info.argtypes = [u8p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
        L.cmda_png_info.restype = ctypes.c_int
        L.cmda_png_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, u8p]
        L.cmda_png_decode.restype = ctypes.c_int
    _lib = L
    return _lib


def available() -> bool:
    return lib() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grayscale(rgb_u8: np.ndarray) -> np.ndarray:
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    out = np.empty(rgb_u8.shape[:-1], np.float32)
    lib().cmda_grayscale(
        rgb_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size, _fp(out))
    return out


def voxel_grid(t, x, y, p, *, bins: int, height: int, width: int) -> np.ndarray:
    t, x, y, p = (np.ascontiguousarray(a, np.float32) for a in (t, x, y, p))
    out = np.zeros((bins, height, width), np.float32)
    lib().cmda_voxel_grid(_fp(t), _fp(x), _fp(y), _fp(p), len(t), bins,
                          height, width, _fp(out))
    return out


def events_norm(grid: np.ndarray, clip: float, final_range: float = 1.0) -> np.ndarray:
    out = np.ascontiguousarray(grid, np.float32).copy()
    lib().cmda_events_norm(_fp(out), out.size, clip, final_range)
    return out


def isr(gray: np.ndarray, *, val_range, threshold: float, clip_range: float,
        shift_pixel: int, direction: str = "rightdown") -> np.ndarray:
    gray = np.ascontiguousarray(gray, np.float32)
    h, w = gray.shape
    out = np.empty((h, w), np.float32)
    lib().cmda_isr(_fp(gray), h, w, float(val_range[0]), float(val_range[1]),
                   threshold, clip_range, shift_pixel,
                   DIRECTION_IDS[direction], _fp(out))
    return out


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def inflate(data: bytes, out_size: int) -> np.ndarray:
    """zlib-inflate one HDF5 gzip chunk (GIL released during the call)."""
    src = np.frombuffer(data, np.uint8)
    out = np.empty(out_size, np.uint8)
    n = lib().cmda_inflate(_u8p(src), len(src), _u8p(out), out_size)
    if n < 0:
        raise ValueError("inflate failed")
    return out[:n]


def unshuffle(data: np.ndarray, elem_size: int) -> np.ndarray:
    """Undo the HDF5 byte-shuffle filter."""
    src = np.ascontiguousarray(data, np.uint8)
    out = np.empty_like(src)
    lib().cmda_unshuffle(_u8p(src), src.size, elem_size, _u8p(out))
    return out


def inflate_batch(chunks: list, chunk_bytes: int, elem_size: int,
                  do_unshuffle: bool) -> np.ndarray:
    """Decode many raw HDF5 chunks in parallel C++ threads.
    Returns a [n_chunks, chunk_bytes] uint8 array."""
    offsets = np.zeros(len(chunks) + 1, np.int64)
    offsets[1:] = np.cumsum([len(c) for c in chunks])
    src = np.frombuffer(b"".join(chunks), np.uint8)
    out = np.empty((len(chunks), chunk_bytes), np.uint8)
    rc = lib().cmda_inflate_batch(
        _u8p(src), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(chunks), chunk_bytes, elem_size, int(do_unshuffle), _u8p(out))
    if rc != 0:
        raise ValueError("inflate_batch failed")
    return out


def png_available() -> bool:
    return available() and hasattr(lib(), "cmda_png_decode")


def png_decode(data: bytes, gray: bool = False) -> np.ndarray:
    """Decode a PNG from memory via libpng (no PIL, GIL-free)."""
    src = np.frombuffer(data, np.uint8)
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib().cmda_png_info(_u8p(src), len(src), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        raise ValueError("bad png")
    ch = 1 if gray else 3
    out = np.empty((h.value, w.value, ch), np.uint8)
    if lib().cmda_png_decode(_u8p(src), len(src), ch, _u8p(out)) != 0:
        raise ValueError("png decode failed")
    return out[..., 0] if gray else out


def voxel_batch(t, x, y, p, offsets, *, bins: int, height: int, width: int,
                clip_scale: float = 1.5 / 500000.0) -> np.ndarray:
    t, x, y, p = (np.ascontiguousarray(a, np.float32) for a in (t, x, y, p))
    offsets = np.ascontiguousarray(offsets, np.int64)
    batch = len(offsets) - 1
    out = np.zeros((batch, bins, height, width), np.float32)
    lib().cmda_voxel_batch(
        _fp(t), _fp(x), _fp(y), _fp(p),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch, bins, height, width, clip_scale, _fp(out))
    return out
