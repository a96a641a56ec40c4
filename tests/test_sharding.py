"""SPMD correctness: the jitted train step over an 8-device `data` mesh must
produce the same loss and parameter updates as single-device execution
(GSPMD inserts the gradient reduction; nothing model-side should change).

The fast suite uses a micro conv net so the 8-device compile stays cheap; the
slow suite keeps the full UNet variant. Ragged batches go through
`shard_batch`'s pad-and-mask path (wrap-padded samples with weight 0) instead
of the silent full replication of round 2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mm_unet_tpu.parallel import make_mesh, replicate, shard_batch
from mm_unet_tpu.train.trainer import (
    create_train_state, make_loss_fn, seg_stats, train_step,
)
from mm_unet_tpu.utils.config import ConfigDict


class MicroNet(nn.Module):
    """Tiny conv net with a BatchNorm so the full train-step machinery
    (mutable batch_stats, dropout rng) is exercised at trivial compile cost."""

    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1))
        # no bias before BN: a bias param there has identically-zero gradient
        # (BN cancels it) and Adam amplifies the reduction-order noise into
        # sign-random updates, which is not a parallelism bug
        h = nn.Conv(8, (3, 3), padding="SAME", use_bias=not self.use_bn)(h)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1))(h)
        return jnp.transpose(h, (0, 3, 1, 2))


def _setup(batch=8, size=16, model=None):
    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=1, num_epochs=10, weight_decay=0.05,
                     steps_per_epoch=4, optimizer="adamw")
    )
    model = model or MicroNet()
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 3, size, size))
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (batch, 1, size, size)) > 0.8
         ).astype(jnp.float32)
    state = create_train_state(model, config, rng, x[:2])
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    return state, loss_fn, x, y


def _spread(state, mesh):
    return state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )


def test_data_parallel_matches_single_device_micro():
    """(a) 1-device vs 8-device step agree on the same global batch."""
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU platform"
    state1, loss_fn, x, y = _setup()
    state8, _, _, _ = _setup()
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    state8 = _spread(state8, mesh)
    sb, w = shard_batch({"image": x, "label": y}, mesh)

    drng = jax.random.key(7)
    new1, scal1, st1 = train_step(state1, x, y, drng, loss_fn)
    new8, scal8, st8 = train_step(state8, sb["image"], sb["label"], drng, loss_fn,
                                  sample_weight=w)
    np.testing.assert_allclose(float(scal1["total_loss"]),
                               float(scal8["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st1["inter"]), np.asarray(st8["inter"]))


def test_ragged_batch_pads_and_masks():
    """(b) batch=5 on 8 devices: padded to 8, weight marks the 5 real rows,
    loss equals the unpadded single-device loss (no silent replication).

    BN-free model: with BatchNorm the wrap-pad rows perturb the batch
    statistics (the same distortion torch's DistributedSampler wrap-padding
    causes in the reference), so exact equality only holds without BN."""
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    state1, loss_fn, x, y = _setup(batch=5, model=MicroNet(use_bn=False))
    state8, _, _, _ = _setup(batch=5, model=MicroNet(use_bn=False))
    state8 = _spread(state8, mesh)
    sb, w = shard_batch({"image": x, "label": y}, mesh)
    assert sb["image"].shape[0] == 8 and w.shape == (8,)
    assert sb["image"].sharding.spec[0] == "data"  # sharded, not replicated
    np.testing.assert_array_equal(np.asarray(w), [1, 1, 1, 1, 1, 0, 0, 0])
    # wrap-padding: pad rows repeat the first real samples
    np.testing.assert_array_equal(np.asarray(sb["image"][5]), np.asarray(x[0]))

    drng = jax.random.key(3)
    _, scal1, _ = train_step(state1, x, y, drng, loss_fn)
    _, scal8, _ = train_step(state8, sb["image"], sb["label"], drng, loss_fn,
                             sample_weight=w)
    np.testing.assert_allclose(float(scal1["total_loss"]),
                               float(scal8["total_loss"]), rtol=1e-5)


def test_metric_stats_exclude_pad_rows():
    """(c) metric aggregation over a padded batch matches the unpadded batch —
    the reference's `accelerator.reduce(...)/num_processes` mean semantics
    (`/root/reference/train.py:72-75`)."""
    from mm_unet_tpu.train.metrics import build_metrics

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((5, 1, 8, 8)), jnp.float32)
    labels = jnp.asarray((rng.uniform(size=(5, 1, 8, 8)) > 0.5).astype(np.float32))
    pad_idx = np.arange(8) % 5
    logits_p = logits[pad_idx]
    labels_p = labels[pad_idx]
    w = jnp.asarray((np.arange(8) < 5).astype(np.float32))

    plain = build_metrics()
    padded = build_metrics()
    for name in plain:
        plain[name].update_stats(seg_stats(logits, labels))
        padded[name].update_stats(seg_stats(logits_p, labels_p, w))
    for name in plain:
        np.testing.assert_allclose(
            plain[name].aggregate(), padded[name].aggregate(), rtol=1e-12,
            err_msg=name,
        )


def test_weighted_losses_match_unpadded():
    """Every registry loss: weighted padded batch == plain unpadded batch."""
    from mm_unet_tpu.train.losses import LOSS_REGISTRY

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 1, 8, 8)), jnp.float32)
    labels = jnp.asarray((rng.uniform(size=(3, 1, 8, 8)) > 0.5).astype(np.float32))
    pad_idx = np.arange(4) % 3
    w = jnp.asarray((np.arange(4) < 3).astype(np.float32))
    for name, fn in LOSS_REGISTRY.items():
        a = float(fn(logits, labels))
        b = float(fn(logits[pad_idx], labels[pad_idx], weight=w))
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=name)


@pytest.mark.slow
def test_data_parallel_matches_single_device_unet():
    from mm_unet_tpu.models.unet import UNet

    state1, loss_fn, x, y = _setup(batch=8, size=32, model=UNet(num_classes=1))
    state8, _, _, _ = _setup(batch=8, size=32, model=UNet(num_classes=1))

    drng = jax.random.key(7)
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    state8 = _spread(state8, mesh)
    sb, w = shard_batch({"image": x, "label": y}, mesh)

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

    _, scal1, _ = train_step(state1, x, y, drng, loss_fn)
    _, scal8, _ = train_step(state8, sb["image"], sb["label"], drng, loss_fn,
                             sample_weight=w)
    np.testing.assert_allclose(
        float(scal1["total_loss"]), float(scal8["total_loss"]), rtol=1e-5
    )


def test_shard_batch_layout():
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    x = jnp.zeros((16, 3, 8, 8))
    sb, w = shard_batch({"x": x}, mesh)
    assert sb["x"].sharding.spec[0] == "data"
    assert float(jnp.sum(w)) == 16


def test_comm_helpers_single_process():
    from mm_unet_tpu.parallel import comm

    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    out = comm.reduce_dict({"x": 2.0, "y": 4.0})
    assert out == {"x": 2.0, "y": 4.0}
