"""SPMD correctness: the jitted train step over an 8-device `data` mesh must
produce the same loss and parameter updates as single-device execution
(GSPMD inserts the gradient reduction; nothing model-side should change)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.models.unet import UNet
from mm_unet_tpu.parallel import make_mesh, replicate, shard_batch
from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
from mm_unet_tpu.utils.config import ConfigDict


def _setup():
    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=1, num_epochs=10, weight_decay=0.05,
                     steps_per_epoch=4, optimizer="adamw")
    )
    model = UNet(num_classes=1)
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (8, 3, 32, 32))
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (8, 1, 32, 32)) > 0.8).astype(
        jnp.float32
    )
    state = create_train_state(model, config, rng, x[:2])
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    return state, loss_fn, x, y


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU platform"
    state1, loss_fn, x, y = _setup()
    state8, _, _, _ = _setup()

    drng = jax.random.key(7)
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    state8 = state8.replace(
        params=replicate(state8.params, mesh),
        batch_stats=replicate(state8.batch_stats, mesh),
        opt_state=replicate(state8.opt_state, mesh),
    )
    sb = shard_batch({"image": x, "label": y}, mesh)

    # compare raw gradients first (Adam's first step is sign-like and
    # amplifies f32 reduction-order noise in the params themselves)
    def grads_of(state, images, labels):
        def loss(p):
            out, _ = state.apply_fn(
                {"params": p, "batch_stats": state.batch_stats}, images,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)},
            )
            total, _ = loss_fn(out, labels)
            return total

        return jax.grad(loss)(state.params)

    g1 = grads_of(state1, x, y)
    g8 = grads_of(state8, sb["image"], sb["label"])
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-4)

    # the jitted optimizer step runs and losses agree across layouts
    _, scal1, _ = train_step(state1, x, y, drng, loss_fn)
    _, scal8, _ = train_step(state8, sb["image"], sb["label"], drng, loss_fn)
    np.testing.assert_allclose(
        float(scal1["total_loss"]), float(scal8["total_loss"]), rtol=1e-5
    )


def test_shard_batch_layout():
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    x = jnp.zeros((16, 3, 8, 8))
    sb = shard_batch({"x": x}, mesh)["x"]
    assert sb.sharding.spec[0] == "data"
    ragged = jnp.zeros((3, 2))
    sr = shard_batch({"x": ragged}, mesh)["x"]  # non-divisible -> replicated
    assert sr.sharding.spec == jax.sharding.PartitionSpec()


def test_comm_helpers_single_process():
    from mm_unet_tpu.parallel import comm

    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    out = comm.reduce_dict({"x": 2.0, "y": 4.0})
    assert out == {"x": 2.0, "y": 4.0}
