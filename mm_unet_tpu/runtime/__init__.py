"""Native runtime bindings (C++ data pipeline via ctypes).

Builds `libmmu_datapipe.so` lazily with g++ on first use (no pybind11; plain
C ABI). Falls back cleanly when no compiler is available — the numpy pipeline
in `mm_unet_tpu.data` remains the reference implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "datapipe.cpp")
_LIB = os.path.join(_HERE, "libmmu_datapipe.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native pipeline; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.mmu_version.restype = ctypes.c_int
    if lib.mmu_version() != 2:
        return None
    _lib = lib
    return lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.float32)
    if src.ndim == 2:
        src = src[..., None]
    sh, sw, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.mmu_resize_bilinear(_f32p(src), sh, sw, c, _f32p(dst), dh, dw)
    return dst


def resize_nearest(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.float32)
    if src.ndim == 2:
        src = src[..., None]
    sh, sw, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.mmu_resize_nearest(_f32p(src), sh, sw, c, _f32p(dst), dh, dw)
    return dst


def prepare_batch(
    images: list[np.ndarray],
    labels: list[np.ndarray],
    idxs: np.ndarray,
    size: int,
    mean,
    std,
    seed: int,
    epoch: int,
    train: bool,
    cutmix_donor_images: Optional[list[np.ndarray]] = None,
    cutmix_donor_labels: Optional[list[np.ndarray]] = None,
    color_jitter: bool = False,
    gaussian_blur: bool = False,
    resized_crop: bool = False,
    patch: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Threaded native batch prep. images[i]: (H,W,3) f32 [0,1]; labels[i]:
    (H,W) f32. Returns (B,3,S,S), (B,1,S,S)."""
    lib = get_lib()
    assert lib is not None
    batch = len(images)
    use_cutmix = cutmix_donor_images is not None

    imgs_c = [np.ascontiguousarray(im, np.float32) for im in images]
    lbls_c = [np.ascontiguousarray(lb, np.float32) for lb in labels]
    don_i = [np.ascontiguousarray(im, np.float32) for im in (cutmix_donor_images or [])]
    don_l = [np.ascontiguousarray(lb, np.float32) for lb in (cutmix_donor_labels or [])]

    PtrArr = ctypes.POINTER(ctypes.c_float) * (batch * 2 if use_cutmix else batch)
    img_ptrs = PtrArr(*([_f32p(a) for a in imgs_c] + [_f32p(a) for a in don_i]))
    lbl_ptrs = PtrArr(*([_f32p(a) for a in lbls_c] + [_f32p(a) for a in don_l]))
    hs = (ctypes.c_int * batch)(*[im.shape[0] for im in imgs_c])
    ws = (ctypes.c_int * batch)(*[im.shape[1] for im in imgs_c])
    id_arr = (ctypes.c_int64 * batch)(*[int(v) for v in idxs])
    mix_arr = (ctypes.c_int64 * batch)(*([0] * batch)) if use_cutmix else None
    mean_a = (ctypes.c_float * 3)(*[float(v) for v in mean])
    std_a = (ctypes.c_float * 3)(*[float(v) for v in std])

    out_img = np.empty((batch, 3, size, size), np.float32)
    out_lbl = np.empty((batch, 1, size, size), np.float32)
    flags = (
        (1 if train else 0) | (2 if use_cutmix else 0)
        | (4 if color_jitter else 0) | (8 if gaussian_blur else 0)
        | (16 if resized_crop else 0)
    )
    lib.mmu_prepare_batch(
        img_ptrs, lbl_ptrs, hs, ws, id_arr,
        ctypes.c_int(batch), ctypes.c_int(size), mean_a, std_a,
        ctypes.c_uint64(seed), ctypes.c_uint64(epoch), ctypes.c_int(flags),
        ctypes.c_int(int(patch or 0)), mix_arr, ctypes.c_int(batch),
        _f32p(out_img), _f32p(out_lbl),
    )
    return out_img, out_lbl
