"""Tensor-parallel (Megatron-over-channels) correctness for the Mamba mixer.

A (data=4, model=2) mesh must produce the same loss and parameter updates as
single-device execution: the TP layout only re-partitions the channel axis of
the Mamba projections/scan (`mm_unet_tpu/parallel/tp.py`), with GSPMD
inserting the x_proj and out_proj psums. The reference has no TP at all
(DDP-only, SURVEY.md §2.7) — this is the TPU-native scaling extension.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from mm_unet_tpu.models.mamba import Mamba
from mm_unet_tpu.parallel import make_mesh, replicate, shard_batch, shard_params
from mm_unet_tpu.parallel.tp import tp_param_specs
from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
from mm_unet_tpu.utils.config import ConfigDict


class MicroMambaNet(nn.Module):
    """Conv stem -> tri-directional Mamba over tokens -> conv head. Small
    enough for a cheap 8-device CPU compile, but exercises every TP-sharded
    param family (in/x/dt/out projections, conv1d, A_log, D, all three
    direction suffixes)."""

    dim: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = nn.Conv(self.dim, (4, 4), strides=(4, 4))(h)  # 16x16 -> 4x4 tokens
        b, hh, ww, c = h.shape
        t = h.reshape(b, hh * ww, c)
        out = Mamba(d_model=self.dim, bimamba_type="v3", nslices=4,
                    scan_impl="ref")(t)
        t = t + out[0]
        h = t.reshape(b, hh, ww, c)
        h = jax.image.resize(h, (b, 16, 16, c), "nearest")
        h = nn.Conv(1, (1, 1))(h)
        return jnp.transpose(h, (0, 3, 1, 2))


def _setup(batch=8):
    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=1, num_epochs=10, weight_decay=0.05,
                     steps_per_epoch=4, optimizer="adamw",
                     flat_optimizer=False)
    )
    model = MicroMambaNet()
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 3, 16, 16))
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (batch, 1, 16, 16)) > 0.8
         ).astype(jnp.float32)
    state = create_train_state(model, config, rng, x[:2])
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    return state, loss_fn, x, y


def test_tp_rules_match_mamba_params():
    """The rule table actually fires on the Mamba param names (a rename would
    silently turn TP into full replication)."""
    state, _, _, _ = _setup()
    mesh = make_mesh(("data", "model"), shape=(4, 2), devices=jax.devices()[:8])
    specs = jax.tree_util.tree_leaves(
        tp_param_specs(state.params, mesh), is_leaf=lambda s: isinstance(s, P)
    )
    n_sharded = sum(1 for s in specs if any(ax == "model" for ax in s))
    # 3 directions x (conv_w, conv_b, x_proj, dt_w, dt_b, A_log, D) + in/out
    assert n_sharded >= 3 * 7 + 2, f"only {n_sharded} TP-sharded params"


def test_tp_matches_single_device():
    """DPxTP (4x2) step == 1-device step on the same global batch."""
    assert len(jax.devices()) >= 8
    state1, loss_fn, x, y = _setup()
    state8, _, _, _ = _setup()
    mesh = make_mesh(("data", "model"), shape=(4, 2), devices=jax.devices()[:8])
    state8 = state8.replace(
        params=shard_params(state8.params, mesh),
        batch_stats=replicate(state8.batch_stats, mesh),
        opt_state=shard_params(state8.opt_state, mesh),
    )
    # the flagship TP leaf is genuinely distributed over the model axis
    ip = state8.params["Mamba_0"]["in_proj_weight"]
    assert ip.sharding.spec == P("model", None), ip.sharding

    sb, w = shard_batch({"image": x, "label": y}, mesh)
    drng = jax.random.key(7)
    new1, scal1, _ = train_step(state1, x, y, drng, loss_fn)
    new8, scal8, _ = train_step(state8, sb["image"], sb["label"], drng, loss_fn,
                                sample_weight=w)
    np.testing.assert_allclose(float(scal1["total_loss"]),
                               float(scal8["total_loss"]), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(new1.params)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(new8.params))
    for path, a in flat1:
        b = flat8[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    # updated params keep their TP sharding (the per-leaf optimizer path
    # must not silently re-replicate the tree after one step); XLA may drop
    # trailing None dims from the spec it reports
    ip_new = new8.params["Mamba_0"]["in_proj_weight"]
    assert tuple(ip_new.sharding.spec)[:1] == ("model",), ip_new.sharding
