"""ctypes bindings to the native host runtime (native/pointcloud_native.cpp).

The shared library is compiled on demand with g++ -O3 and cached next to the
source; every binding has a pure-numpy fallback so the framework works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parents[2] / "native" / "pointcloud_native.cpp"
_LIB_PATH = _SRC.parent / "libpointcloud_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-fno-math-errno", "-fopenmp",
             "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("Native library build failed (%s); using numpy fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() or \
            _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.load_kitti_scan_quantized.restype = ctypes.c_int
        lib.load_kitti_scan_quantized.argtypes = [
            ctypes.c_char_p, ctypes.c_float, ctypes.c_void_p, ctypes.c_int]
        lib.load_kitti_scan.restype = ctypes.c_int
        lib.load_kitti_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int]
        lib.quantize_pad.restype = ctypes.c_int
        lib.quantize_pad.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_void_p,
            ctypes.c_int]
        lib.grid_sample_mask.restype = ctypes.c_int
        lib.grid_sample_mask.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_void_p]
        lib.lc_subsample.restype = ctypes.c_int
        lib.lc_subsample.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.c_void_p]
        lib.encode_range_image.restype = ctypes.c_int
        lib.encode_range_image.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_void_p]
        _lib = lib
    except OSError as e:
        logger.warning("Could not load native library: %s", e)
    return _lib


def load_kitti_scan_quantized(path: str, quantization: float,
                              capacity: int) -> Optional[Tuple[np.ndarray, int]]:
    """One-pass read+correct+scrub+pad+quantize. None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((capacity, 3), np.int16)
    n = lib.load_kitti_scan_quantized(
        path.encode(), ctypes.c_float(quantization),
        out.ctypes.data_as(ctypes.c_void_p), capacity)
    if n < 0:
        return None
    return out, int(n)


def load_kitti_scan(path: str, capacity: int) -> Optional[Tuple[np.ndarray, int]]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((capacity, 3), np.float32)
    n = lib.load_kitti_scan(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                            capacity)
    if n < 0:
        return None
    return out, int(n)


def quantize_pad(points: np.ndarray, quantization: float,
                 capacity: int) -> Optional[Tuple[np.ndarray, int]]:
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points[:, :3], np.float32)
    out = np.zeros((capacity, 3), np.int16)
    n = lib.quantize_pad(points.ctypes.data_as(ctypes.c_void_p),
                         points.shape[0], ctypes.c_float(quantization),
                         out.ctypes.data_as(ctypes.c_void_p), capacity)
    return out, int(n)


def grid_sample_mask(points: np.ndarray, voxel_size: float) -> Optional[np.ndarray]:
    """O(n) hash-table voxel sampling mask (first point per voxel)."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points[:, :3], np.float32)
    keep = np.zeros((points.shape[0],), np.uint8)
    lib.grid_sample_mask(points.ctypes.data_as(ctypes.c_void_p),
                         points.shape[0], ctypes.c_float(voxel_size),
                         keep.ctypes.data_as(ctypes.c_void_p))
    return keep.astype(bool)


def lc_subsample(points: np.ndarray, voxel_size: float,
                 cap: int) -> Optional[Tuple[np.ndarray, int]]:
    """Fused zero-drop + first-per-voxel + even cap-selection, one O(n)
    pass.  Returns a zero-padded (cap, 3) float32 buffer and the number of
    valid rows, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points[:, :3], np.float32)
    out = np.zeros((cap, 3), np.float32)
    n = lib.lc_subsample(points.ctypes.data_as(ctypes.c_void_p),
                         points.shape[0], ctypes.c_float(voxel_size),
                         cap, out.ctypes.data_as(ctypes.c_void_p))
    return out, int(n)


def encode_range_image(points: np.ndarray, h: int, w: int,
                       fov_up_rad: float, fov_down_rad: float,
                       range_step: float,
                       sub16: bool = False,
                       planes: bool = False) -> Optional[np.ndarray]:
    """O(n) single-pass z-buffered range-image encode.

    Default: (h*w, 3) rows [r_lo, r_hi, sub] (4+4-bit sub-pixel offsets);
    sub16: (h*w, 4) with 8+8-bit offsets; planes: (h*w + (h+w)/2, 2)
    range-only pixels followed by per-row/per-column mean angular offset
    planes.  None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points[:, :3], np.float32)
    if planes:
        out = np.zeros((h * w + (h + w + 1) // 2, 2), np.uint8)
        mode = 2
    else:
        out = np.zeros((h * w, 4 if sub16 else 3), np.uint8)
        mode = 1 if sub16 else 0
    lib.encode_range_image(points.ctypes.data_as(ctypes.c_void_p),
                           points.shape[0], h, w,
                           ctypes.c_float(fov_up_rad),
                           ctypes.c_float(fov_down_rad),
                           ctypes.c_float(range_step),
                           mode,
                           out.ctypes.data_as(ctypes.c_void_p))
    return out
