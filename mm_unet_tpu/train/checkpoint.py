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


def param_manifest(tree) -> dict[str, list[int]]:
    """Flatten a variables/params pytree into {'a/b/c': shape} — the stable
    identity of a checkpoint. Committed as a fixture and asserted in tests so
    a module-renumbering restructure (like round-1 -> round-2's conv-padding
    change) fails CI instead of silently orphaning trained checkpoints."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        out[key] = list(np.shape(leaf))
    return out


def remap_params(old_tree, new_template, verbose: bool = True):
    """Best-effort remap of an old checkpoint's leaves onto a renamed/
    renumbered module tree.

    Leaves are paired by (leaf name, shape) buckets in natural-sorted path
    order on BOTH sides — module renumbering (e.g. `BatchNorm_4` ->
    `BatchNorm_5` after inserting a layer) preserves relative order, so
    ordered pairing recovers the correspondence, and an unchanged tree maps
    to itself exactly. (Exact-path matching is deliberately NOT used: after a
    shift, a stale path can still exist with the same shape and would steal
    the wrong leaf.) Returns (new_tree, report) where report lists unmatched
    old and new paths; ambiguous buckets are paired in order and reported so
    the caller can verify.
    """
    import re

    def natkey(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    old_paths = jax.tree_util.tree_flatten_with_path(old_tree)[0]
    new_paths, treedef = jax.tree_util.tree_flatten_with_path(new_template)
    to_key = lambda p: "/".join(str(getattr(k, "key", k)) for k in p)  # noqa: E731

    old = {to_key(p): leaf for p, leaf in old_paths}
    new_keys = [to_key(p) for p, _ in new_paths]
    new_leaves = [leaf for _, leaf in new_paths]

    result = {}
    # (leaf name, shape) buckets in natural path order
    from collections import defaultdict

    bucket_old = defaultdict(list)
    for k in sorted(old, key=natkey):
        bucket_old[(k.rsplit("/", 1)[-1], tuple(np.shape(old[k])))].append(k)
    unmatched_new = []
    shapes = dict(zip(new_keys, (np.shape(x) for x in new_leaves)))
    template = dict(zip(new_keys, new_leaves))
    # consume new paths in NATURAL order too (lexicographic flatten order
    # puts Conv_10 before Conv_2, which would scramble the pairing)
    for k in sorted(new_keys, key=natkey):
        leaf = template[k]
        b = (k.rsplit("/", 1)[-1], tuple(shapes[k]))
        cands = bucket_old.get(b)
        if cands:
            src = cands.pop(0)
            result[k] = old[src]
            if verbose and src != k:
                print(f"remap_params: {src} -> {k}")
        else:
            unmatched_new.append(k)
            result[k] = leaf  # keep template init
    unmatched_old = [k for ks in bucket_old.values() for k in ks]
    if verbose and (unmatched_new or unmatched_old):
        print(f"remap_params: {len(unmatched_new)} new paths kept init, "
              f"{len(unmatched_old)} old leaves dropped")
    new_tree = jax.tree_util.tree_unflatten(
        treedef, [result[k] for k in new_keys]
    )
    return new_tree, {"unmatched_new": unmatched_new, "unmatched_old": unmatched_old}


def adapt_flat_opt_vectors(restored_tree, template_tree):
    """Length-adapt the flat AdamW m/v/wd vectors to the template.

    flat_adamw pads its vectors to a multiple of 256 (ZeRO-1 shardability);
    checkpoints written before that (or with a different multiple) carry the
    raw length. The pad lanes are exactly-zero by construction, so zero-
    padding (or truncating trailing zeros) a restored vector reproduces the
    state the current optimizer would have reached — no resume break.
    """

    def fix(path, restored, template):
        name = getattr(path[-1], "key", None)
        if (
            name in ("m", "v", "wd")
            and getattr(restored, "ndim", None) == 1
            and getattr(template, "ndim", None) == 1
            and restored.shape != template.shape
        ):
            n = template.shape[0]
            if restored.shape[0] < n:
                return np.pad(np.asarray(restored), (0, n - restored.shape[0]))
            return np.asarray(restored)[:n]
        return restored

    return jax.tree_util.tree_map_with_path(fix, restored_tree, template_tree)


def resume_train_state(manager: CheckpointManager, state_tree, mode: str = "checkpoint"):
    """Reference `utils.resume_train_state` (`src/utils.py:29-53`): restore
    params/opt state and metadata; on any failure fall back to fresh start.
    A checkpoint whose flat-AdamW vector lengths differ (padding multiple
    changed across versions) is length-adapted instead of discarded."""
    try:
        restored, meta = manager.load(mode, state_tree)
        # orbax restores saved shapes verbatim even when the template
        # disagrees, so always length-adapt (no-op when lengths match)
        restored = adapt_flat_opt_vectors(restored, state_tree)
        return restored, int(meta.get("epoch", 0)), float(meta.get("best_acc", 0.0)), meta
    except Exception as e:  # noqa: BLE001 — parity: ref swallows and restarts
        print(f"resume failed ({e}); starting from epoch 0")
        return state_tree, 0, 0.0, {}
