"""Trainer-stack tests: losses vs golden values, metric semantics,
sliding-window exactness, scheduler closed form, and a mini end-to-end
training run with checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.train import losses as L
from mm_unet_tpu.train import metrics as M
from mm_unet_tpu.train.inferers import sliding_window_inference
from mm_unet_tpu.train.optim import warmup_cosine_epoch_schedule, wd_mask


def test_focal_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
    tgt = (rng.random((2, 1, 8, 8)) > 0.5).astype(np.float32)
    lt, tt = torch.from_numpy(logits), torch.from_numpy(tgt)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p = torch.sigmoid(lt)
    pt = p * tt + (1 - p) * (1 - tt)
    want = float((ce * (1 - pt) ** 2).mean())
    got = float(L.focal_loss(logits, tgt, gamma=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_loss_perfect_prediction():
    tgt = np.zeros((1, 1, 8, 8), np.float32)
    tgt[0, 0, 2:6, 2:6] = 1
    logits = np.where(tgt > 0, 20.0, -20.0).astype(np.float32)
    assert float(L.dice_loss(logits, tgt, smooth_nr=0, smooth_dr=1e-5)) < 1e-3
    assert float(L.dice_focal_loss(logits, tgt)) < 1e-3


def test_dice_loss_known_value():
    # pred = all ones (sigmoid(large)), target covers half -> dice = 2*I/(P+T)
    tgt = np.zeros((1, 1, 4, 4), np.float32)
    tgt[0, 0, :2] = 1
    logits = np.full((1, 1, 4, 4), 20.0, np.float32)
    # I = 8, P = 16, T = 8 -> dice score 16/24, loss 1/3
    got = float(L.dice_loss(logits, tgt, smooth_nr=0, smooth_dr=1e-5))
    np.testing.assert_allclose(got, 1 / 3, rtol=1e-4)


def test_metrics_semantics():
    pred = np.zeros((2, 1, 4, 4), np.float32)
    tgt = np.zeros((2, 1, 4, 4), np.float32)
    pred[0, 0, :2] = 1
    tgt[0, 0, :2] = 1  # sample 0 perfect
    pred[1, 0, :1] = 1
    tgt[1, 0, 1:2] = 1  # sample 1 disjoint (4 fp, 4 fn)
    mets = M.build_metrics()
    for m in mets.values():
        m(y_pred=pred, y=tgt)
    dice = mets["dice_metric"].aggregate()
    np.testing.assert_allclose(dice, [(1.0 + 0.0) / 2])
    iou = mets["miou_metric"].aggregate()
    np.testing.assert_allclose(iou, [0.5])
    # confusion counts over both samples: tp=8, fp=4, fn=4, tn=16
    f1 = mets["f1"].aggregate()
    np.testing.assert_allclose(f1, [2 * 8 / (2 * 8 + 4 + 4)])
    acc = mets["ACC"].aggregate()
    np.testing.assert_allclose(acc, [(8 + 16) / 32])
    prec = mets["precision"].aggregate()
    np.testing.assert_allclose(prec, [8 / 12])


def test_hd95_zero_for_identical():
    m = M.HausdorffDistanceMetric(percentile=95)
    mask = np.zeros((1, 1, 16, 16), bool)
    mask[0, 0, 4:10, 4:10] = True
    m(y_pred=mask, y=mask)
    np.testing.assert_allclose(m.aggregate(), [0.0])


def test_sliding_window_exact_for_pointwise_model():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 20, 20)).astype(np.float32)

    def predictor(win):  # pointwise model -> stitching must be exact
        return jnp.tanh(win[:, :1] * 2.0 + win[:, 1:2])

    direct = predictor(jnp.asarray(x))
    stitched = sliding_window_inference(jnp.asarray(x), (8, 8), predictor, overlap=0.5)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(direct), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sliding_window_jitted_predictor_path_matches_legacy():
    """trainer.Predictor takes the one-dispatch jitted pipeline; a UNet with
    batch_stats on a multi-window input must match the legacy callable path."""
    from mm_unet_tpu.models.unet import UNet
    from mm_unet_tpu.train.trainer import Predictor

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 3, 48, 48)).astype(np.float32))
    model = UNet(num_classes=1)
    variables = model.init(jax.random.key(0), x[:, :, :32, :32])
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    has_bs = bool(jax.tree_util.tree_leaves(bs))

    def legacy(win):
        v = {"params": params}
        if has_bs:
            v["batch_stats"] = bs
        return model.apply(v, win, train=False)

    pred = Predictor(model.apply, params, bs, has_bs)
    want = sliding_window_inference(x, (32, 32), legacy, overlap=0.5)
    got = sliding_window_inference(x, (32, 32), pred, overlap=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sliding_window_small_image_pads():
    x = np.ones((1, 3, 6, 6), np.float32)
    out = sliding_window_inference(jnp.asarray(x), (8, 8), lambda w: w[:, :1], overlap=0.5)
    assert out.shape == (1, 1, 6, 6)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_warmup_cosine_schedule():
    sched = warmup_cosine_epoch_schedule(1e-3, 2, 100, steps_per_epoch=10)
    assert float(sched(0)) == 0.0  # epoch 0 of warmup
    np.testing.assert_allclose(float(sched(10)), 1e-3)  # epoch 1 end of warmup (w-1)
    np.testing.assert_allclose(float(sched(20)), 1e-3)  # epoch 2 = base
    assert float(sched(990)) < 1e-5  # near end of cosine


def test_wd_mask_excludes_no_decay():
    params = {
        "A_log": jnp.zeros((4, 16)),
        "kernel": jnp.zeros((3, 3, 8, 8)),
        "bias": jnp.zeros((8,)),
        "dt_proj_bias": jnp.zeros((8,)),
        "scale": jnp.zeros((8,)),
    }
    mask = wd_mask(params)
    assert mask["kernel"] is True
    assert mask["A_log"] is False
    assert mask["bias"] is False
    assert mask["dt_proj_bias"] is False
    assert mask["scale"] is False  # 1-D norm param


@pytest.mark.slow
def test_mini_training_loop_and_checkpoint(tmp_path):
    """UNet on synthetic 64x64: loss decreases over a few steps; checkpoint
    save/restore round-trips exactly."""
    from mm_unet_tpu.data.loaders import DataLoader, make_synthetic
    from mm_unet_tpu.models.unet import UNet
    from mm_unet_tpu.parallel import make_mesh, shard_batch
    from mm_unet_tpu.train.checkpoint import CheckpointManager
    from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
    from mm_unet_tpu.utils.config import ConfigDict

    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=1, num_epochs=10, weight_decay=0.05,
                     steps_per_epoch=4, optimizer="adamw")
    )
    ds = make_synthetic(8, 64, seed=0)
    loader = DataLoader(ds, 2, 64, [0.485, 0.456, 0.406], [0.229, 0.224, 0.225],
                        train=True, seed=0)
    model = UNet(num_classes=1)
    rng = jax.random.key(0)
    state = create_train_state(model, config, rng, jnp.zeros((2, 3, 64, 64)))
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    mesh = make_mesh()

    losses = []
    for epoch in range(3):
        for batch in loader:
            sb, w = shard_batch({"image": batch["image"], "label": batch["label"]}, mesh)
            state, scalars, _ = train_step(state, sb["image"], sb["label"],
                                           jax.random.key(epoch), loss_fn,
                                           sample_weight=w)
            losses.append(float(scalars["total_loss"]))
    assert losses[-1] < losses[0]

    mgr = CheckpointManager(str(tmp_path), "unet")
    tree = {"params": state.params}
    mgr.save_best(tree, {"epoch": 3, "best_acc": 0.5})
    restored, meta = mgr.load("best", tree)
    assert meta["epoch"] == 3
    a = jax.tree_util.tree_leaves(restored["params"])[0]
    b = jax.tree_util.tree_leaves(tree["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sliding_window_gaussian_exact_for_pointwise():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 20, 20)).astype(np.float32)

    def predictor(win):
        return jnp.tanh(win[:, :1] * 2.0)

    direct = predictor(jnp.asarray(x))
    stitched = sliding_window_inference(jnp.asarray(x), (8, 8), predictor,
                                        overlap=0.5, mode="gaussian")
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_multiclass_training_step():
    """5-class (EDD-style) labels flow through loss/step/metrics."""
    from mm_unet_tpu.models.unet import UNet
    from mm_unet_tpu.train.metrics import build_metrics
    from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
    from mm_unet_tpu.utils.config import ConfigDict

    config = ConfigDict(trainer=dict(lr=1e-3, warmup=1, num_epochs=5,
                                     weight_decay=0.05, steps_per_epoch=2,
                                     optimizer="adamw"))
    model = UNet(num_classes=5)
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (2, 3, 32, 32))
    y = (jax.random.uniform(jax.random.fold_in(rng, 1), (2, 5, 32, 32)) > 0.8).astype(
        jnp.float32)
    state = create_train_state(model, config, rng, x)
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    state, scalars, stats = train_step(state, x, y, rng, loss_fn)
    assert stats["inter"].shape == (2, 5)
    assert stats["npix"] == 32 * 32
    mets = build_metrics()
    for m in mets.values():
        m.update_stats(stats)
    dice = mets["dice_metric"].aggregate()
    assert dice.shape == (5,)  # per-class values for the EDD breakdown


def test_stats_metrics_match_dense_updates():
    """update_stats (device sufficient statistics) agrees with update
    (full-resolution masks) across the whole metric dict."""
    from mm_unet_tpu.train.metrics import build_metrics
    from mm_unet_tpu.train.trainer import seg_stats

    rng = np.random.default_rng(7)
    dense = build_metrics()
    from_stats = build_metrics()
    for _ in range(3):
        logits = jnp.asarray(rng.standard_normal((2, 3, 16, 16)), jnp.float32)
        y = jnp.asarray((rng.random((2, 3, 16, 16)) > 0.7), jnp.float32)
        preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        stats = seg_stats(logits, y)
        for m in dense.values():
            m(y_pred=np.asarray(preds), y=np.asarray(y))
        for m in from_stats.values():
            m.update_stats(stats)
    for name in dense:
        np.testing.assert_allclose(
            dense[name].aggregate(), from_stats[name].aggregate(),
            rtol=1e-6, atol=1e-9, err_msg=name,
        )


def test_train_step_without_batch_stats():
    """A BatchNorm-free model (empty batch_stats, has_batch_stats=False) goes
    through train_step: flax apply(mutable=[]) returns a (y, {}) TUPLE even
    for the empty list, so the stat-less branch must pass mutable=False
    (regression: HWAUNETR was the first BN-free model driven via train.py)."""
    from flax import linen as nn
    from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
    from mm_unet_tpu.utils.config import ConfigDict

    class NoBN(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            h = jnp.transpose(x, (0, 2, 3, 1))
            h = nn.Conv(4, (3, 3), padding="SAME")(h)
            h = nn.GroupNorm(num_groups=2)(nn.relu(h))
            h = nn.Conv(1, (1, 1))(h)
            return jnp.transpose(h, (0, 3, 1, 2))

    config = ConfigDict(trainer=dict(lr=1e-3, warmup=1, num_epochs=5,
                                     weight_decay=0.05, steps_per_epoch=2,
                                     optimizer="adamw"))
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (2, 3, 16, 16))
    y = (jax.random.uniform(jax.random.fold_in(rng, 1), (2, 1, 16, 16)) > 0.8
         ).astype(jnp.float32)
    state = create_train_state(NoBN(), config, rng, x)
    assert not jax.tree_util.tree_leaves(state.batch_stats)
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    state, scalars, stats = train_step(state, x, y, rng, loss_fn,
                                       has_batch_stats=False)
    assert jnp.isfinite(scalars["total_loss"])
    assert stats["inter"].shape == (2, 1)
