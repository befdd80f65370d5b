"""ctypes bindings for the native host runtime (native/tcnerf_native.cpp).

Builds on first use (`make -C native`) and falls back to numpy implementations
transparently if the toolchain or library is unavailable. All entry points
keep numpy semantics identical to tcnerf.core.rays / ops.interpolate.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtcnerf_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def load(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) and build:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rays_from_pixels.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.u8_to_f32_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.gather_target_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.bilinear_gather_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.tcnerf_native_version.restype = ctypes.c_int
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def rays_from_pixels(u, v, extrinsics, intrinsics, normalize: bool = True):
    """Native get_specific_rays (tcnerf.core.rays semantics)."""
    lib = load()
    if lib is None:
        from ..core.rays import get_specific_rays
        return get_specific_rays(u, v, extrinsics, intrinsics, normalize)
    u = _f32(u)
    v = _f32(v)
    n = u.shape[0]
    ext = np.ascontiguousarray(extrinsics, dtype=np.float64)
    k_inv = np.ascontiguousarray(
        np.linalg.inv(np.asarray(intrinsics, np.float64)[:3, :3]))
    rays_o = np.empty((n, 3), np.float32)
    rays_d = np.empty((n, 3), np.float32)
    lib.rays_from_pixels(_ptr(u, ctypes.c_float), _ptr(v, ctypes.c_float),
                         n, _ptr(ext, ctypes.c_double),
                         _ptr(k_inv, ctypes.c_double), int(normalize),
                         _ptr(rays_o, ctypes.c_float),
                         _ptr(rays_d, ctypes.c_float))
    return rays_o, rays_d


def u8_to_f32_rgb(image: np.ndarray) -> np.ndarray:
    """uint8 [H, W, C>=3] -> float32 [H, W, 3] in [0, 1]."""
    lib = load()
    if lib is None:
        return (image[..., :3] / 255.0).astype(np.float32)
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    out = np.empty((h, w, 3), np.float32)
    lib.u8_to_f32_rgb(_ptr(image, ctypes.c_uint8), h, w, c,
                      _ptr(out, ctypes.c_float))
    return out


def gather_target_rgb(image: np.ndarray, pix: np.ndarray) -> np.ndarray:
    """uint8 image + [N, 2] (row, col) -> float32 [N, 3] in [0, 1]."""
    lib = load()
    if lib is None:
        return (image[pix[:, 0], pix[:, 1], :3] / 255.0).astype(np.float32)
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    rows = np.ascontiguousarray(pix[:, 0], np.int32)
    cols = np.ascontiguousarray(pix[:, 1], np.int32)
    out = np.empty((pix.shape[0], 3), np.float32)
    lib.gather_target_rgb(_ptr(image, ctypes.c_uint8), h, w, c,
                          _ptr(rows, ctypes.c_int32), _ptr(cols, ctypes.c_int32),
                          pix.shape[0], _ptr(out, ctypes.c_float))
    return out


def bilinear_gather_cpu(image: np.ndarray, coords_xy: np.ndarray) -> np.ndarray:
    """float32 [H, W, C] + [N, 2] (x, y) -> [N, C] (host-side oracle)."""
    lib = load()
    image = _f32(image)
    coords = _f32(coords_xy)
    if lib is None:
        import jax.numpy as jnp
        from ..ops.interpolate import bilinear_gather
        return np.asarray(bilinear_gather(jnp.asarray(image)[None],
                                          jnp.asarray(coords)[None])[0])
    h, w, c = image.shape
    out = np.empty((coords.shape[0], c), np.float32)
    lib.bilinear_gather_f32(_ptr(image, ctypes.c_float), h, w, c,
                            _ptr(coords, ctypes.c_float), coords.shape[0],
                            _ptr(out, ctypes.c_float))
    return out
