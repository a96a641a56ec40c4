"""Evaluation entry — parity with the reference `verify.py`: warm-up
fine-tune epochs, then validation with HD95 added to the metric set; loads
the best checkpoint; selection on `Val/mean dice_metric`
(`/root/reference/verify.py:114,155,173`)."""

from __future__ import annotations

import sys

import jax
import numpy as np

from mm_unet_tpu.data import get_dataloader
from mm_unet_tpu.models import give_model
from mm_unet_tpu.parallel import make_mesh
from mm_unet_tpu.train.checkpoint import CheckpointManager
from mm_unet_tpu.train.inferers import SlidingWindowInferer
from mm_unet_tpu.train.metrics import HausdorffDistanceMetric, build_metrics
from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, make_predictor
from mm_unet_tpu.utils import Logger, load_config, same_seeds
from mm_unet_tpu.utils.tracker import ScalarTracker
from train import train_one_epoch, val_one_epoch


def main():
    import os

    config = load_config(os.environ.get("MMU_CONFIG", "config.yml"))
    same_seeds(int(config.trainer.get("seed", 50)))
    name = config.finetune.checkpoint
    logger = Logger(f"verify_{name}")  # noqa: F841
    tracker = ScalarTracker(logger.dir)  # scalars.jsonl (reference verify.py:122)

    mesh = make_mesh()
    model = give_model(config)
    train_loader, val_loader = get_dataloader(config)
    params = config.dataset[config.trainer.dataset_choose]
    image_size = int(params.image_size)
    config.trainer.steps_per_epoch = len(train_loader)

    inferer = SlidingWindowInferer(roi_size=(image_size, image_size), overlap=0.5)
    metrics = build_metrics(include_background=True)
    metrics["hd95"] = HausdorffDistanceMetric(percentile=95)
    loss_fn = make_loss_fn(
        {"dice_focal_loss": dict(smooth_nr=0.0, smooth_dr=1e-5)},
        {"dice_focal_loss": 1.0},
    )

    rng = jax.random.key(int(config.trainer.get("seed", 50)))
    sample = jax.numpy.zeros(
        (int(params.batch_size), 3, image_size, image_size), jax.numpy.float32
    )
    state = create_train_state(model, config, rng, sample)

    manager = CheckpointManager("model_store", name)
    if manager.has("best"):
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
        restored, _ = manager.load("best", tree)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        print(f"loaded best checkpoint for {name}")

    warmup = int(config.trainer.get("verify_warmup", 1))
    train_metrics = build_metrics(include_background=True)
    step = 0
    for epoch in range(warmup):
        state, step, rng = train_one_epoch(
            state, loss_fn, train_loader, train_metrics, mesh, epoch, step, rng,
            config, tracker=tracker,
        )

    best_acc, metric, _ = val_one_epoch(
        state, loss_fn, inferer, val_loader, metrics, 0, 0, config, tracker=tracker
    )
    dice = metric.get("Val/mean dice_metric", float("nan"))
    print(f"verify: best dice {dice:.4f}; metrics: {metric}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
