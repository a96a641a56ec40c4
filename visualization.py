"""Qualitative evaluation — parity with the reference `visualization.py`:
loads the best checkpoint, runs sliding-window inference per validation
image, saves predicted masks, and draws contour overlays plus green/red
error maps vs the ground truth (`/root/reference/visualization.py:121-216`).
PIL-based (cv2-free) rendering."""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from mm_unet_tpu.data import get_dataloader
from mm_unet_tpu.models import give_model
from mm_unet_tpu.train.checkpoint import CheckpointManager
from mm_unet_tpu.train.inferers import SlidingWindowInferer
from mm_unet_tpu.train.trainer import create_train_state, make_predictor
from mm_unet_tpu.utils import load_config, same_seeds


def error_map(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """RGB error visualisation: green = false negative, red = false positive,
    white = true positive (reference `visualization`, `:146-216`)."""
    h, w = pred.shape
    img = np.zeros((h, w, 3), np.uint8)
    tp = (pred > 0) & (gt > 0)
    fp = (pred > 0) & (gt == 0)
    fn = (pred == 0) & (gt > 0)
    img[tp] = (255, 255, 255)
    img[fp] = (255, 0, 0)
    img[fn] = (0, 255, 0)
    return img


def contour_overlay(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Draw mask boundary (morphological gradient) in green over the image."""
    from scipy import ndimage

    m = mask > 0
    boundary = m & ~ndimage.binary_erosion(m)
    img = (image * 255).clip(0, 255).astype(np.uint8).copy()
    img[boundary] = (0, 255, 0)
    return img


def main():
    from PIL import Image

    config = load_config("config.yml")
    same_seeds(int(config.trainer.get("seed", 50)))
    name = config.get("visualization", {}).get("checkpoint", config.finetune.checkpoint)
    out_dir = config.get("visualization", {}).get("save_dir", "visualization")
    os.makedirs(out_dir, exist_ok=True)

    model = give_model(config)
    _, val_loader = get_dataloader(config)
    params = config.dataset[config.trainer.dataset_choose]
    image_size = int(params.image_size)

    rng = jax.random.key(50)
    sample = jax.numpy.zeros((1, 3, image_size, image_size), jax.numpy.float32)
    state = create_train_state(model, config, rng, sample)
    manager = CheckpointManager("model_store", name)
    if manager.has("best"):
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
        restored, _ = manager.load("best", tree)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])

    inferer = SlidingWindowInferer(roi_size=(image_size, image_size), overlap=0.5)
    predictor = make_predictor(state)

    mean = np.asarray(params.get("image_mean", [0.485, 0.456, 0.406]))
    std = np.asarray(params.get("image_std", [0.229, 0.224, 0.225]))
    for i, batch in enumerate(val_loader):
        logits = inferer(batch["image"], predictor)
        pred = (np.asarray(jax.nn.sigmoid(logits)) > 0.5).astype(np.uint8)[0, 0]
        gt = batch["label"][0, 0]
        rgb = np.transpose(batch["image"][0], (1, 2, 0)) * std + mean

        Image.fromarray(pred * 255).save(os.path.join(out_dir, f"{i}_mask.tif"))
        Image.fromarray(error_map(pred, gt)).save(os.path.join(out_dir, f"{i}_error.png"))
        Image.fromarray(contour_overlay(rgb, pred)).save(
            os.path.join(out_dir, f"{i}_contour.png")
        )
        print(f"saved visualisation {i}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
