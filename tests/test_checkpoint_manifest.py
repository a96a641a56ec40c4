"""Checkpoint-stability guard (VERDICT r2 item 8).

The round-1 -> round-2 conv-padding restructure silently renumbered flax
modules and orphaned round-1 checkpoints. Two defenses:

1. a committed param-tree manifest for the flagship — this test FAILS when a
   restructure changes any path or shape, forcing a deliberate manifest bump
   plus a remap path for existing checkpoints;
2. `remap_params`, which re-homes an old checkpoint's leaves onto a
   renumbered tree by (leaf name, shape) in natural path order.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.train.checkpoint import param_manifest, remap_params

_MANIFEST = os.path.join(os.path.dirname(__file__), "fixtures",
                         "mmnet_param_manifest.json")


@pytest.mark.slow
def test_mmnet_param_manifest_stable():
    from mm_unet_tpu.models.mm_unet import MM_Net

    m = MM_Net(num_classes=1, num_slices_list=(4, 4, 2, 2), remat=False,
               depths=(1, 1, 1, 1))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               jnp.zeros((1, 3, 64, 64)))
    got = param_manifest(v)
    with open(_MANIFEST) as f:
        want = json.load(f)
    missing = sorted(set(want) - set(got))
    added = sorted(set(got) - set(want))
    changed = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    assert not (missing or added or changed), (
        "MM_Net parameter tree changed — existing checkpoints will not "
        "restore. If intentional: regenerate tests/fixtures/"
        "mmnet_param_manifest.json AND provide a remap (see remap_params). "
        f"missing={missing[:5]} added={added[:5]} changed={changed[:5]} "
        f"(counts {len(missing)}/{len(added)}/{len(changed)})"
    )


def test_remap_params_handles_renumbering():
    """Simulate the r1->r2 breakage: module numbers shift after an insertion;
    remap_params recovers every old leaf into the new tree."""
    old = {
        "params": {
            "Conv_0": {"kernel": np.ones((3, 3, 3, 8)), "bias": np.zeros(8)},
            "BatchNorm_0": {"scale": np.ones(8), "bias": np.zeros(8)},
            "Conv_1": {"kernel": np.full((1, 1, 8, 4), 2.0), "bias": np.ones(4)},
        }
    }
    # restructure inserted a new conv: old Conv_1 is now Conv_2, and a fresh
    # Conv_1 appeared with a new shape
    new = {
        "params": {
            "Conv_0": {"kernel": np.zeros((3, 3, 3, 8)), "bias": np.zeros(8)},
            "BatchNorm_0": {"scale": np.zeros(8), "bias": np.zeros(8)},
            "Conv_1": {"kernel": np.zeros((3, 3, 8, 8)), "bias": np.zeros(8)},
            "Conv_2": {"kernel": np.zeros((1, 1, 8, 4)), "bias": np.zeros(4)},
        }
    }
    out, report = remap_params(old, new, verbose=False)
    np.testing.assert_array_equal(out["params"]["Conv_0"]["kernel"],
                                  old["params"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(out["params"]["Conv_2"]["kernel"],
                                  old["params"]["Conv_1"]["kernel"])
    np.testing.assert_array_equal(out["params"]["Conv_2"]["bias"],
                                  old["params"]["Conv_1"]["bias"])
    # the genuinely-new module keeps its template init and is reported
    assert "params/Conv_1/kernel" in report["unmatched_new"]
    assert report["unmatched_old"] == []


@pytest.mark.slow
def test_remap_params_roundtrip_real_model():
    """Renumber a real UNet tree (shift every DoubleConv index by one) and
    check remap recovers an exact restore."""
    from mm_unet_tpu.models.unet import UNet

    m = UNet(num_classes=1)
    v = m.init(jax.random.key(0), jnp.zeros((1, 3, 32, 32)))
    v = jax.tree_util.tree_map(np.asarray, v)

    def rename(tree):
        out = {}
        for k, sub in tree.items():
            nk = k
            if k.startswith("DoubleConv_"):
                nk = f"DoubleConv_{int(k.split('_')[1]) + 1}"
            out[nk] = rename(sub) if isinstance(sub, dict) else sub
        return out

    old = {c: rename(dict(v[c])) for c in v}
    out, report = remap_params(old, v, verbose=False)
    assert not report["unmatched_new"] and not report["unmatched_old"]
    for a, b in zip(jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(v)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_adapts_flat_opt_vector_lengths(tmp_path):
    """A checkpoint written with UNPADDED flat-AdamW vectors (pre-ZeRO-1
    layout, pad_to=1) must resume into the padded (pad_to=256) template with
    the moments intact and zeros in the pad lanes — not silently restart
    from epoch 0."""
    from flax import linen as nn
    from mm_unet_tpu.train.checkpoint import CheckpointManager, resume_train_state
    from mm_unet_tpu.train.optim import flat_adamw, wd_mask

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(nn.Dense(5)(x))

    m = Tiny()
    params = m.init(jax.random.key(0), jnp.zeros((1, 7)))["params"]
    n_raw = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_raw % 256 != 0

    old_tx = flat_adamw(1e-3, mask_tree=wd_mask(params), pad_to=1)
    old_opt = old_tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, old_opt = old_tx.update(g, old_opt, params)  # nonzero m/v
    manager = CheckpointManager(str(tmp_path), "flat_adapt")
    tree = {"params": params, "batch_stats": {}, "opt_state": old_opt}
    manager.save_checkpoint(tree, {"epoch": 7, "best_acc": 0.5})

    new_tx = flat_adamw(1e-3, mask_tree=wd_mask(params))  # pad_to=256 default
    template = {"params": params, "batch_stats": {},
                "opt_state": new_tx.init(params)}
    restored, epoch, best, _ = resume_train_state(manager, template)
    assert epoch == 7 and best == 0.5
    m_vec = np.asarray(restored["opt_state"]["m"])
    assert m_vec.shape[0] == -(-n_raw // 256) * 256
    np.testing.assert_array_equal(m_vec[:n_raw], np.asarray(old_opt["m"]))
    assert not m_vec[n_raw:].any()
    assert int(restored["opt_state"]["count"]) == 1
