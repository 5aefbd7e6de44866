"""ctypes bindings for the native augmentation core (augment.cpp).

Builds ``libledaug.so`` with g++ on first import (cached next to the source);
every entry point has a numpy fallback so the package works without a
toolchain. See ``augment.cpp`` for the rationale (the reference's CPU-side
hot path re-done as fused native kernels).
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SO = osp.join(_HERE, 'libledaug.so')
_SRC = osp.join(_HERE, 'augment.cpp')
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
             '-pthread', _SRC, '-o', _SO],
            check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_SO) or osp.getmtime(_SO) < osp.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resize_bilinear_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p] + \
        [ctypes.c_int] * 2
    lib.resize_nearest_u8.argtypes = lib.resize_bilinear_u8.argtypes
    lib.fused_resize_crop_flip_u8.argtypes = \
        [u8p] + [ctypes.c_int] * 11 + [u8p]
    lib.batch_fused_augment_u8.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 HWC bilinear resize (half-pixel, torch convention)."""
    src = np.ascontiguousarray(src)
    sh, sw, c = src.shape
    lib = get_lib()
    out = np.empty((dh, dw, c), np.uint8)
    if lib is None:
        return _py_resize(src, dh, dw, nearest=False)
    lib.resize_bilinear_u8(_u8ptr(src), sh, sw, c, _u8ptr(out), dh, dw)
    return out


def resize_nearest_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    src = np.ascontiguousarray(src if src.ndim == 3 else src[..., None])
    sh, sw, c = src.shape
    lib = get_lib()
    if lib is None:
        out = _py_resize(src, dh, dw, nearest=True)
    else:
        out = np.empty((dh, dw, c), np.uint8)
        lib.resize_nearest_u8(_u8ptr(src), sh, sw, c, _u8ptr(out), dh, dw)
    return out


def fused_resize_crop_flip(src: np.ndarray, resize_hw, crop_yx, crop_hw,
                           flip: bool, nearest: bool = False) -> np.ndarray:
    """One-pass resize->crop->flip on a uint8 HWC array."""
    squeeze = src.ndim == 2
    src = np.ascontiguousarray(src if src.ndim == 3 else src[..., None])
    sh, sw, c = src.shape
    ch, cw = crop_hw
    out = np.empty((ch, cw, c), np.uint8)
    lib = get_lib()
    if lib is None:
        full = _py_resize(src, resize_hw[0], resize_hw[1], nearest)
        out = full[crop_yx[0]:crop_yx[0] + ch, crop_yx[1]:crop_yx[1] + cw]
        if flip:
            out = out[:, ::-1]
        out = np.ascontiguousarray(out)
    else:
        lib.fused_resize_crop_flip_u8(
            _u8ptr(src), sh, sw, c, resize_hw[0], resize_hw[1],
            crop_yx[0], crop_yx[1], ch, cw, int(flip), int(nearest),
            _u8ptr(out))
    return out[..., 0] if squeeze else out


def batch_fused_augment(srcs, params, crop_hw, nearest: bool = False,
                        n_threads: int = 8) -> np.ndarray:
    """Assemble a batch with per-sample geometry in native threads.

    srcs: list of uint8 HWC arrays; params: (n, 7) int32 rows
    [sh, sw, rh, rw, cy, cx, flip]. Returns (n, ch, cw, C).
    """
    lib = get_lib()
    n = len(srcs)
    c = srcs[0].shape[2] if srcs[0].ndim == 3 else 1
    ch, cw = crop_hw
    if lib is None:
        outs = [fused_resize_crop_flip(
            s, (p[2], p[3]), (p[4], p[5]), crop_hw, bool(p[6]), nearest)
            for s, p in zip(srcs, params)]
        return np.stack([o if o.ndim == 3 else o[..., None] for o in outs])
    srcs = [np.ascontiguousarray(s if s.ndim == 3 else s[..., None])
            for s in srcs]
    params = np.ascontiguousarray(params, np.int32)
    out = np.empty((n, ch, cw, c), np.uint8)
    PtrArray = ctypes.POINTER(ctypes.c_uint8) * n
    ptrs = PtrArray(*[_u8ptr(s) for s in srcs])
    lib.batch_fused_augment_u8(
        ptrs, params.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n, c,
        ch, cw, int(nearest), _u8ptr(out), n_threads)
    return out


def _py_resize(src: np.ndarray, dh: int, dw: int, nearest: bool) -> np.ndarray:
    """Numpy fallback with identical coordinate math."""
    sh, sw, c = src.shape
    if nearest:
        ys = np.minimum((np.arange(dh) * (sh / dh)).astype(np.int64), sh - 1)
        xs = np.minimum((np.arange(dw) * (sw / dw)).astype(np.int64), sw - 1)
        return src[ys][:, xs]
    sy = np.maximum((np.arange(dh) + 0.5) * (sh / dh) - 0.5, 0)
    sx = np.maximum((np.arange(dw) + 0.5) * (sw / dw) - 0.5, 0)
    y0 = np.minimum(sy.astype(np.int64), sh - 1)
    x0 = np.minimum(sx.astype(np.int64), sw - 1)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = (sy - y0)[:, None, None]
    wx = (sx - x0)[None, :, None]
    a = src[y0][:, x0].astype(np.float32)
    b = src[y0][:, x1].astype(np.float32)
    d = src[y1][:, x0].astype(np.float32)
    e = src[y1][:, x1].astype(np.float32)
    top = a + (b - a) * wx
    bot = d + (e - d) * wx
    return (top + (bot - top) * wy + 0.5).astype(np.uint8)
