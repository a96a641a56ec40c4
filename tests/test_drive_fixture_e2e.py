"""File-based DRIVE loader end-to-end (VERDICT r2 item 9).

A committed mini DRIVE-format tree (tests/fixtures/drive_mini: train/input +
train/label/{base}.png, val/input + val/label/{base}_manual1.png, 64² images)
exercises the REAL file path — `pair_directory` label patterns, CLAHE,
center padding, normalization — rather than the synthetic fallback; the slow
test drives the actual `train.py` -> `test.py` CLI round trip on it.

Reference behaviours covered: `src/VesselLoader.py:198-230,412-419` (pairing),
`:283-288` (val center padding), `:491-499` (CLAHE at load).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FIX = os.path.join(_ROOT, "tests", "fixtures", "drive_mini")


def _config_text(tmp, image_size=64, epochs=2):
    return f"""
trainer:
  num_epochs: {epochs}
  warmup: 1
  lr: 0.001
  optimizer: adamw
  weight_decay: 0.05
  seed: 50
  dataset_choose: DRIVE
  train_ratio: 0.8
dataset:
  DRIVE:
    data_root: "{_FIX}"
    batch_size: 2
    image_size: {image_size}
    image_mean: [0.485, 0.456, 0.406]
    image_std: [0.229, 0.224, 0.225]
finetune:
  checkpoint: drive_mini_e2e
  model_choose: UNet
models:
  unet:
    branch1:
      num_classes: 1
"""


def test_pair_directory_and_loader_on_files():
    from mm_unet_tpu.data.loaders import pair_directory
    from mm_unet_tpu.data import get_dataloader
    from mm_unet_tpu.utils.config import ConfigDict
    import yaml

    train_pairs = pair_directory(
        os.path.join(_FIX, "train"), "input", "label", "{base_name}.png"
    )
    val_pairs = pair_directory(
        os.path.join(_FIX, "val"), "input", "label", "{base_name}_manual1.png"
    )
    assert len(train_pairs) == 4 and len(val_pairs) == 2
    assert all(os.path.exists(p["label"]) for p in train_pairs + val_pairs)
    # wrong pattern pairs nothing (the _manual1 suffix is load-bearing)
    assert pair_directory(
        os.path.join(_FIX, "val"), "input", "label", "{base_name}.png"
    ) == []

    config = ConfigDict(yaml.safe_load(_config_text("")))
    train_loader, val_loader = get_dataloader(config)
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, 3, 64, 64)
    assert batch["label"].shape == (2, 1, 64, 64)
    assert set(np.unique(batch["label"])) <= {0.0, 1.0}
    # normalized image: not raw [0,1]
    assert batch["image"].min() < -0.5
    vb = next(iter(val_loader))
    assert vb["image"].shape[2:] == (64, 64)


def test_center_padding_small_val_images():
    """image_size larger than the stored files -> val center-pads
    (reference `VesselLoader.py:283-288`)."""
    from mm_unet_tpu.data import get_dataloader
    from mm_unet_tpu.utils.config import ConfigDict
    import yaml

    config = ConfigDict(yaml.safe_load(_config_text("", image_size=96)))
    _, val_loader = get_dataloader(config)
    vb = next(iter(val_loader))
    assert vb["image"].shape[2:] == (96, 96)


@pytest.mark.slow
def test_train_then_test_cli_round_trip(tmp_path):
    """`train.py` 2 epochs then `test.py` on the file-backed mini DRIVE tree;
    test.py must restore the best checkpoint and report metrics."""
    cfg = tmp_path / "config.yml"
    cfg.write_text(_config_text(str(tmp_path)))
    env = dict(os.environ, MMU_CONFIG=str(cfg), JAX_PLATFORMS="cpu")
    # generous timeout: the subprocess grabs the real TPU when present (the
    # axon plugin ignores JAX_PLATFORMS=cpu from the env) and may recompile
    r1 = subprocess.run([sys.executable, "train.py"], cwd=_ROOT, env=env,
                        capture_output=True, text=True, timeout=1800)
    assert r1.returncode == 0, r1.stdout[-2000:] + r1.stderr[-2000:]
    assert "new best f1" in r1.stdout
    assert os.path.isdir(os.path.join(_ROOT, "model_store", "drive_mini_e2e", "best"))
    r2 = subprocess.run([sys.executable, "test.py"], cwd=_ROOT, env=env,
                        capture_output=True, text=True, timeout=1800)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "test: dice" in r2.stdout
