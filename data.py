"""Bare mini dataset — parity with the reference's top-level `data.py`
(42 LoC: cv2 0-1 normalised retina pairs, unused by the main trainer)."""

from __future__ import annotations

import os

import numpy as np


class RetinaDataset:
    """Directory of (image, mask) pairs, 0-1 normalised, NCHW float32."""

    def __init__(self, img_dir: str, mask_dir: str):
        from PIL import Image

        self.items = []
        for fname in sorted(os.listdir(img_dir)) if os.path.isdir(img_dir) else []:
            mp = os.path.join(mask_dir, fname)
            if os.path.exists(mp):
                with Image.open(os.path.join(img_dir, fname)) as im:
                    img = np.asarray(im.convert("RGB"), np.float32) / 255.0
                with Image.open(mp) as m:
                    mask = np.asarray(m.convert("L"), np.float32) / 255.0
                self.items.append((img.transpose(2, 0, 1), (mask > 0.5)[None].astype(np.float32)))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]
