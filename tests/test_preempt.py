"""Graceful-preemption handling (TPU spot/maintenance SIGTERM).

The reference has no fault tolerance beyond resume-from-checkpoint
(SURVEY.md §5); `mm_unet_tpu/utils/preempt.py` adds the SIGTERM→save→exit 0
protocol, and `train.py` resumes the interrupted epoch on restart.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FIX = os.path.join(_ROOT, "tests", "fixtures", "drive_mini")


def test_graceful_shutdown_flag():
    from mm_unet_tpu.utils.preempt import GracefulShutdown

    g = GracefulShutdown().install()
    try:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously (CPython)
        assert g.requested
        # a second SIGTERM is idempotent (no exception, flag stays set)
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.requested
    finally:
        g.uninstall()


def _config_text(store: str) -> str:
    return f"""
trainer:
  num_epochs: 500
  warmup: 1
  lr: 0.001
  optimizer: adamw
  weight_decay: 0.05
  seed: 50
  dataset_choose: DRIVE
  train_ratio: 0.8
  resume: true
dataset:
  DRIVE:
    data_root: "{_FIX}"
    batch_size: 2
    image_size: 64
    image_mean: [0.485, 0.456, 0.406]
    image_std: [0.229, 0.224, 0.225]
finetune:
  checkpoint: preempt_e2e
  model_choose: UNet
models:
  unet:
    branch1:
      num_classes: 1
"""


@pytest.mark.slow
def test_sigterm_saves_checkpoint_and_resumes(tmp_path):
    """SIGTERM mid-run → clean exit 0 with a saved checkpoint; a second
    launch resumes from it (not from epoch 0)."""
    import shutil

    shutil.rmtree(os.path.join(_ROOT, "model_store", "preempt_e2e"),
                  ignore_errors=True)
    cfg = tmp_path / "config.yml"
    cfg.write_text(_config_text(str(tmp_path)))
    env = dict(os.environ, MMU_CONFIG=str(cfg), JAX_PLATFORMS="cpu")

    p = subprocess.Popen([sys.executable, "train.py"], cwd=_ROOT, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    # wait until training has demonstrably started (a few epochs logged),
    # then preempt
    deadline = time.time() + 1500
    lines = []
    for line in p.stdout:
        lines.append(line)
        if "Epoch [3/" in line or time.time() > deadline:
            break
    p.send_signal(signal.SIGTERM)
    out_rest, _ = p.communicate(timeout=600)
    out = "".join(lines) + out_rest
    assert p.returncode == 0, out[-2000:]
    assert "[preempt] checkpoint saved at epoch" in out
    ckpt = os.path.join(_ROOT, "model_store", "preempt_e2e", "checkpoint")
    assert os.path.isdir(ckpt)

    # restart: must resume from a non-zero epoch
    p2 = subprocess.Popen([sys.executable, "train.py"], cwd=_ROOT, env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True)
    lines2 = []
    resumed = False
    deadline = time.time() + 1500
    for line in p2.stdout:
        lines2.append(line)
        if "Epoch [" in line:
            resumed = not line.startswith("Epoch [1/")
            break
        if time.time() > deadline:
            break
    p2.send_signal(signal.SIGTERM)
    p2.communicate(timeout=600)
    assert resumed, "".join(lines2)[-2000:]
