"""ZeRO-1 optimizer-state sharding correctness.

The flat single-vector AdamW state (m/v/wd) laid out P("data") over an
8-device mesh must produce bitwise-equivalent training steps to the
replicated single-device path — ZeRO-1 is a memory layout, not a different
optimizer. The reference has no optimizer sharding at all (DDP replicates
the moments on every rank); this is the TPU-native scaling extension
(`mm_unet_tpu/parallel/zero.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from mm_unet_tpu.parallel import (is_flat_adamw_state, make_mesh, replicate,
                                  shard_batch, shard_opt_state)
from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
from mm_unet_tpu.utils.config import ConfigDict


class TinyConvNet(nn.Module):
    """BN-free conv net whose raveled param count is NOT a multiple of 256 —
    exercises flat_adamw's fixed-multiple zero padding (what makes the flat
    vectors evenly shardable on any mesh axis up to 256)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = nn.relu(nn.Conv(6, (3, 3), padding="SAME")(h))
        h = nn.GroupNorm(num_groups=1)(h)
        h = nn.relu(nn.Conv(5, (3, 3), padding="SAME")(h))
        h = nn.Conv(1, (1, 1))(h)
        return jnp.transpose(h, (0, 3, 1, 2))


def _setup(batch=8):
    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=1, num_epochs=10, weight_decay=0.05,
                     steps_per_epoch=4, optimizer="adamw")  # flat by default
    )
    model = TinyConvNet()
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 3, 16, 16))
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (batch, 1, 16, 16)) > 0.8
         ).astype(jnp.float32)
    state = create_train_state(model, config, rng, x[:2])
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    return state, loss_fn, x, y


def test_flat_state_detection_and_padding_shape():
    state, _, _, _ = _setup()
    assert is_flat_adamw_state(state.opt_state)
    n_raw = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    n_vec = int(state.opt_state["m"].shape[0])
    assert n_raw % 256 != 0, "fixture should exercise real padding"
    assert n_vec == -(-n_raw // 256) * 256  # padded to the fixed multiple
    assert int(jnp.count_nonzero(state.opt_state["wd"][n_raw:])) == 0


def test_zero1_matches_single_device():
    """DP=8 step with ZeRO-1-sharded moments == 1-device step, and the
    updated moments KEEP their P('data') layout (the memory saving must
    survive the jitted update, not be silently re-replicated)."""
    assert len(jax.devices()) >= 8
    state1, loss_fn, x, y = _setup()
    state8, _, _, _ = _setup()
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    state8 = state8.replace(
        params=replicate(state8.params, mesh),
        batch_stats=replicate(state8.batch_stats, mesh),
        opt_state=shard_opt_state(state8.opt_state, mesh),
    )
    assert state8.opt_state["m"].sharding.spec == P("data")
    # each device holds exactly 1/8 of the (256-padded) moment vector
    n = int(state8.opt_state["m"].shape[0])
    local = state8.opt_state["m"].addressable_shards[0].data.shape[0]
    assert local == n // 8

    sb, w = shard_batch({"image": x, "label": y}, mesh)
    drng = jax.random.key(7)
    new1, scal1, _ = train_step(state1, x, y, drng, loss_fn)
    new8, scal8, _ = train_step(state8, sb["image"], sb["label"], drng, loss_fn,
                                sample_weight=w)
    np.testing.assert_allclose(float(scal1["total_loss"]),
                               float(scal8["total_loss"]), rtol=1e-6)
    for key in ("m", "v"):
        np.testing.assert_allclose(
            np.asarray(new1.opt_state[key]), np.asarray(new8.opt_state[key]),
            rtol=1e-5, atol=1e-8, err_msg=key,
        )
    flat1 = jax.tree_util.tree_leaves_with_path(new1.params)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(new8.params))
    for path, a in flat1:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat8[path]), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )
    # ZeRO-1 invariant: updated moments stay data-sharded
    spec = tuple(new8.opt_state["m"].sharding.spec or ())
    assert spec[:1] == ("data",), new8.opt_state["m"].sharding


def test_shard_opt_state_non_flat_replicates():
    """Per-leaf optax state (TP path) passes through fully replicated —
    shard_opt_state must not mangle unfamiliar structures."""
    state, _, _, _ = _setup()
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    fake = {"count": state.opt_state["count"], "mu": state.params}
    out = shard_opt_state(fake, mesh)
    leaf = jax.tree_util.tree_leaves(out["mu"])[0]
    assert leaf.sharding.spec == P()
