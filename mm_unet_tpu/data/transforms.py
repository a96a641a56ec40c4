"""Host-side image transforms (numpy) mirroring the reference pipelines:
flips / cutmix / center padding / resize / ImageNet normalisation
(`/root/reference/src/VesselLoader.py:257-352`) and the LAB color-exchange
polyp augmentation (`src/CVCLoder.py:36-50`).
"""

from __future__ import annotations

import numpy as np


def resize_image(img: np.ndarray, size: tuple[int, int], nearest: bool = False) -> np.ndarray:
    """img: (H, W, C) or (H, W) float. PIL-based resize (bilinear / nearest)."""
    from PIL import Image

    mode_in = img
    squeeze = False
    if img.ndim == 2:
        squeeze = True
    arr = np.asarray(mode_in)
    pil = Image.fromarray(
        (arr * 255).clip(0, 255).astype(np.uint8) if arr.dtype != np.uint8 else arr
    )
    pil = pil.resize((size[1], size[0]), Image.NEAREST if nearest else Image.BILINEAR)
    out = np.asarray(pil).astype(np.float32) / 255.0
    if squeeze and out.ndim == 3:
        out = out[..., 0]
    return out


def center_padding(img: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Pad (H, W, ...) with zeros so H >= target_h, W >= target_w, centred
    (reference `center_padding`, `VesselLoader.py:103-141`)."""
    h, w = img.shape[:2]
    ph, pw = max(target_h - h, 0), max(target_w - w, 0)
    pad = [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad)


def random_flips(rng: np.random.Generator, img: np.ndarray, lbl: np.ndarray):
    """Random horizontal + vertical flips, p=0.5 each (`VesselLoader.py:290-296`)."""
    if rng.random() < 0.5:
        img, lbl = img[:, ::-1], lbl[:, ::-1]
    if rng.random() < 0.5:
        img, lbl = img[::-1], lbl[::-1]
    return np.ascontiguousarray(img), np.ascontiguousarray(lbl)


def cut_mix(rng: np.random.Generator, img_a, lbl_a, img_b, lbl_b, beta: float = 1.0):
    """CutMix between two samples (`VesselLoader.py:42-100`)."""
    h, w = img_a.shape[:2]
    lam = rng.beta(beta, beta)
    cut = np.sqrt(1.0 - lam)
    ch, cw = int(h * cut), int(w * cut)
    cy, cx = rng.integers(h), rng.integers(w)
    y1, y2 = np.clip(cy - ch // 2, 0, h), np.clip(cy + ch // 2, 0, h)
    x1, x2 = np.clip(cx - cw // 2, 0, w), np.clip(cx + cw // 2, 0, w)
    img = img_a.copy()
    lbl = lbl_a.copy()
    img[y1:y2, x1:x2] = img_b[y1:y2, x1:x2]
    lbl[y1:y2, x1:x2] = lbl_b[y1:y2, x1:x2]
    return img, lbl


def lab_color_exchange(rng: np.random.Generator, img: np.ndarray, donor: np.ndarray):
    """LAB-space colour statistics exchange between polyp samples
    (`CVCLoder.py:36-50`): donor's per-channel LAB mean/std imposed on img.
    Approximated in RGB space when no cv2 is available."""
    m_i, s_i = img.mean((0, 1)), img.std((0, 1)) + 1e-6
    m_d, s_d = donor.mean((0, 1)), donor.std((0, 1)) + 1e-6
    return ((img - m_i) / s_i * s_d + m_d).clip(0, 1)


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def to_nchw(img: np.ndarray) -> np.ndarray:
    return np.transpose(img, (2, 0, 1))
