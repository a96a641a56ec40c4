"""Checkpoint / resume via orbax — layout parity with the reference's
Accelerate scheme (`/root/reference/train.py:280-290`):
`model_store/<name>/best` on metric improvement, `model_store/<name>/checkpoint`
every epoch, plus sidecar metadata `{epoch, best_acc, best_class}`
(the `epoch.pth.tar` equivalent, stored as JSON).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, root: str, name: str):
        self.base = os.path.abspath(os.path.join(root, name))
        os.makedirs(self.base, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _save(self, tag: str, state_tree: Any, meta: dict):
        path = os.path.join(self.base, tag)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path, _to_saveable(state_tree))
        self._ckpt.wait_until_finished()
        with open(os.path.join(self.base, f"{tag}_meta.json"), "w") as f:
            json.dump(meta, f)

    def save_best(self, state_tree: Any, meta: dict):
        self._save("best", state_tree, meta)

    def save_checkpoint(self, state_tree: Any, meta: dict):
        self._save("checkpoint", state_tree, meta)

    def load(self, tag: str, target: Any) -> tuple[Any, dict]:
        path = os.path.join(self.base, tag)
        restored = self._ckpt.restore(path, target=_to_saveable(target))
        meta_path = os.path.join(self.base, f"{tag}_meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return restored, meta

    def has(self, tag: str) -> bool:
        return os.path.isdir(os.path.join(self.base, tag))


def resume_train_state(manager: CheckpointManager, state_tree, mode: str = "checkpoint"):
    """Reference `utils.resume_train_state` (`src/utils.py:29-53`): restore
    params/opt state and metadata; on any failure fall back to fresh start."""
    try:
        restored, meta = manager.load(mode, state_tree)
        return restored, int(meta.get("epoch", 0)), float(meta.get("best_acc", 0.0)), meta
    except Exception as e:  # noqa: BLE001 — parity: ref swallows and restarts
        print(f"resume failed ({e}); starting from epoch 0")
        return state_tree, 0, 0.0, {}
