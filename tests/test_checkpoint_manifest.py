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

from mm_unet_tpu.train.checkpoint import param_manifest, remap_params

_MANIFEST = os.path.join(os.path.dirname(__file__), "fixtures",
                         "mmnet_param_manifest.json")


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
