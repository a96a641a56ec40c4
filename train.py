"""Training entry — interface parity with the reference `train.py`:
config-driven (no CLI args), per-step loss logging, 7-metric accumulation,
best-checkpoint selection on `Val/mean f1`, best/last checkpoints with
{epoch, best_acc, best_class} metadata.

TPU-native: one jitted SPMD step over a `data`-axis mesh (XLA emits the
gradient all-reduce; no torchrun/NCCL), sliding-window validation jitted per
window batch.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from mm_unet_tpu.data import get_dataloader
from mm_unet_tpu.models import give_model
from mm_unet_tpu.parallel import make_mesh, replicate, shard_batch, shard_opt_state
from mm_unet_tpu.train.checkpoint import CheckpointManager, resume_train_state
from mm_unet_tpu.train.inferers import SlidingWindowInferer
from mm_unet_tpu.train.metrics import build_metrics
from mm_unet_tpu.train.trainer import (
    create_train_state, make_loss_fn, make_predictor, train_step,
)
from mm_unet_tpu.utils import GracefulShutdown, Logger, load_config, same_seeds
from mm_unet_tpu.utils.tracker import ScalarTracker


def train_one_epoch(state, loss_fn, train_loader, metrics, mesh, epoch, step, rng,
                    config, tracker=None, stop=None):
    t0 = time.time()
    n_img = 0
    num_epochs = config.trainer.num_epochs
    n_batches = len(train_loader)
    pending = None  # (batch_idx, step, scalars) of the previously dispatched step

    def _flush(entry):
        """Sync + log the PREVIOUS step's loss while the current one runs on
        device (1-deep pipeline: the host never stalls the accelerator)."""
        i, s, scalars = entry
        loss_val = float(scalars["total_loss"])
        print(
            f"Epoch [{epoch + 1}/{num_epochs}] "
            f"Training [{i + 1}/{n_batches}] Loss: {loss_val:1.5f}",
            flush=True,
        )
        if tracker is not None:
            tracker.log({f"Train/{k}": v for k, v in scalars.items()}, step=s)

    for i, batch in enumerate(train_loader):
        if stop is not None and stop.requested:
            break  # preemption: stop at a step boundary; caller checkpoints
        sharded, weight = shard_batch(
            {"image": batch["image"], "label": batch["label"]}, mesh
        )
        rng, sub = jax.random.split(rng)
        state, scalars, stats = train_step(
            state, sharded["image"], sharded["label"], sub, loss_fn,
            has_batch_stats=bool(jax.tree_util.tree_leaves(state.batch_stats)),
            sample_weight=weight,
        )
        # metric accumulation from tiny device-side stats; no host sync here
        for name in metrics:
            metrics[name].update_stats(stats)
        n_img += batch["image"].shape[0]
        if pending is not None:
            _flush(pending)
        pending = (i, step, scalars)
        step += 1
    if pending is not None:
        _flush(pending)
    dt = time.time() - t0
    metric = {}
    for name in metrics:
        metric[f"Train/mean {name}"] = float(np.nanmean(metrics[name].aggregate()))
        metrics[name].reset()
    metric["Train/images_per_sec"] = n_img / max(dt, 1e-9)
    print(f"Epoch [{epoch + 1}/{config.trainer.num_epochs}] Training metric {metric}")
    if tracker is not None:
        tracker.log(metric, step=step)
    return state, step, rng


def val_one_epoch(state, loss_fn, inferer, val_loader, metrics, epoch, step, config,
                  tracker=None):
    predictor = make_predictor(state)
    for i, batch in enumerate(val_loader):
        logits = inferer(batch["image"], predictor)
        total, _ = loss_fn(logits, batch["label"])
        preds = (jax.nn.sigmoid(logits) > 0.5).astype(np.float32)
        for name in metrics:
            metrics[name](y_pred=np.asarray(preds), y=batch["label"])
        loss_val = float(total)
        print(
            f"Epoch [{epoch + 1}/{config.trainer.num_epochs}] "
            f"Validation [{i + 1}/{len(val_loader)}] Loss: {loss_val:1.5f}",
            flush=True,
        )
        if tracker is not None:
            tracker.log({"Val/total_loss": loss_val}, step=step)
        step += 1
    metric = {}
    for name in metrics:
        agg = metrics[name].aggregate()
        metrics[name].reset()
        metric[f"Val/mean {name}"] = float(np.nanmean(agg))
        if config.trainer.dataset_choose == "EDD_seg" and np.size(agg) == 5:
            for cls, v in zip(("BE", "cancer", "HGD", "polyp", "suspicious"), np.ravel(agg)):
                metric[f"Val/{cls} {name}"] = float(v)
    print(f"Epoch [{epoch + 1}/{config.trainer.num_epochs}] Validation metric {metric}")
    if tracker is not None:
        tracker.log(metric, step=step)
    return metric["Val/mean f1"], metric, step


def main():
    import os

    config = load_config(os.environ.get("MMU_CONFIG", "config.yml"))
    same_seeds(int(config.trainer.get("seed", 50)))
    checkpoint_name = config.finetune.checkpoint
    logger = Logger(checkpoint_name)  # noqa: F841 — tees stdout/stderr
    tracker = ScalarTracker(logger.dir)  # scalars.jsonl (reference accelerator.log)

    mesh = make_mesh()
    print(f"devices: {jax.devices()} mesh: {mesh}")

    model = give_model(config)
    train_loader, val_loader = get_dataloader(config)
    params = config.dataset[config.trainer.dataset_choose]
    image_size = int(params.image_size)
    config.trainer.steps_per_epoch = len(train_loader)

    inferer = SlidingWindowInferer(roi_size=(image_size, image_size), overlap=0.5)
    metrics = build_metrics(include_background=True)
    val_metrics = build_metrics(include_background=True)
    loss_fn = make_loss_fn(
        {"dice_focal_loss": dict(smooth_nr=0.0, smooth_dr=1e-5)},
        {"dice_focal_loss": 1.0},
    )

    rng = jax.random.key(int(config.trainer.get("seed", 50)))
    sample = jax.numpy.zeros(
        (int(params.batch_size), 3, image_size, image_size), jax.numpy.float32
    )
    state = create_train_state(model, config, rng, sample)

    manager = CheckpointManager("model_store", checkpoint_name)
    starting_epoch, best_acc, best_meta = 0, 0.0, {}
    if config.trainer.get("resume", False):
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
        restored, starting_epoch, best_acc, best_meta = resume_train_state(manager, tree)
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(starting_epoch * len(train_loader), jax.numpy.int32),
        )

    if mesh.devices.size > 1:
        # explicit SPMD placement: params/stats replicated; ZeRO-1 shards the
        # flat AdamW moment vectors over `data` (trainer.zero1: false opts out)
        opt_state = (
            shard_opt_state(state.opt_state, mesh)
            if config.trainer.get("zero1", True)
            else replicate(state.opt_state, mesh)
        )
        state = state.replace(
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            opt_state=opt_state,
        )

    # preemption (SIGTERM/SIGINT) → finish the in-flight step, save a resume
    # checkpoint, exit 0; restart with trainer.resume: true continues
    stop = GracefulShutdown().install()

    step = int(state.step)
    val_step = 0
    for epoch in range(starting_epoch, int(config.trainer.num_epochs)):
        state, step, rng = train_one_epoch(
            state, loss_fn, train_loader, metrics, mesh, epoch, step, rng, config,
            tracker=tracker, stop=stop,
        )
        if stop.requested:
            tree = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state}
            # epoch NOT +1: the interrupted epoch is redone on resume
            manager.save_checkpoint(tree, {
                "epoch": epoch, "best_acc": best_acc,
                "best_class": best_meta.get("best_class", {}),
            })
            print(f"[preempt] checkpoint saved at epoch {epoch}; exiting")
            return 0
        mean_f1, metric, val_step = val_one_epoch(
            state, loss_fn, inferer, val_loader, val_metrics, epoch, val_step, config,
            tracker=tracker,
        )
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
        meta = {"epoch": epoch + 1, "best_acc": best_acc, "best_class": metric}
        if mean_f1 > best_acc:
            best_acc = mean_f1
            meta["best_acc"] = best_acc
            manager.save_best(tree, meta)
            print(f"new best f1 {best_acc:.4f} at epoch {epoch + 1}")
        manager.save_checkpoint(tree, meta)
    print(f"best f1: {best_acc:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
