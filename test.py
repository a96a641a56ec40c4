"""Test entry — evaluation without warm-up fine-tuning.

The reference ships a `test.py` that is non-runnable scratch (undefined
imports); the *stated* interface of the project is `train.py / test.py /
config.yml` (BASELINE.md), so this is a thin runnable evaluation surface:
load the best checkpoint named by `finetune.checkpoint`, run sliding-window
validation with the full metric set + HD95, and print/track the results.

Config-driven like the reference (`MMU_CONFIG` env var overrides the path).
"""

from __future__ import annotations

import sys


def main():
    import os

    import jax

    from mm_unet_tpu.data import get_dataloader
    from mm_unet_tpu.models import give_model
    from mm_unet_tpu.train.checkpoint import CheckpointManager
    from mm_unet_tpu.train.inferers import SlidingWindowInferer
    from mm_unet_tpu.train.metrics import HausdorffDistanceMetric, build_metrics
    from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn
    from mm_unet_tpu.utils import Logger, load_config, same_seeds
    from mm_unet_tpu.utils.tracker import ScalarTracker
    from train import val_one_epoch

    config = load_config(os.environ.get("MMU_CONFIG", "config.yml"))
    same_seeds(int(config.trainer.get("seed", 50)))
    name = config.finetune.checkpoint
    logger = Logger(f"test_{name}")  # noqa: F841 — tees stdout/stderr
    tracker = ScalarTracker(logger.dir)

    model = give_model(config)
    _, val_loader = get_dataloader(config)
    params = config.dataset[config.trainer.dataset_choose]
    image_size = int(params.image_size)

    inferer = SlidingWindowInferer(roi_size=(image_size, image_size), overlap=0.5)
    metrics = build_metrics(include_background=True)
    metrics["hd95"] = HausdorffDistanceMetric(percentile=95)
    loss_fn = make_loss_fn(
        {"dice_focal_loss": dict(smooth_nr=0.0, smooth_dr=1e-5)},
        {"dice_focal_loss": 1.0},
    )

    rng = jax.random.key(int(config.trainer.get("seed", 50)))
    sample = jax.numpy.zeros((1, 3, image_size, image_size), jax.numpy.float32)
    state = create_train_state(model, config, rng, sample)

    manager = CheckpointManager("model_store", name)
    if manager.has("best"):
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
        restored, _ = manager.load("best", tree)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        print(f"loaded best checkpoint for {name}")
    else:
        print(f"warning: no best checkpoint for {name}; evaluating at init")

    _, metric, _ = val_one_epoch(
        state, loss_fn, inferer, val_loader, metrics, 0, 0, config, tracker=tracker
    )
    dice = metric.get("Val/mean dice_metric", float("nan"))
    print(f"test: dice {dice:.4f}; metrics: {metric}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
