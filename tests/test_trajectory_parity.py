"""End-to-end TRAIN-STEP TRAJECTORY parity vs the reference's own trainer
(VERDICT r3 item 3).

Per-model forward parity (`test_reference_parity.py`) does not cover
loss/optimizer/scheduler semantics drift. Here the reference's literal
`train_one_epoch` (`/root/reference/train.py:28-79`) drives a tiny reference
MM_Net on torch CPU, this repo's `train_step` drives the SAME initial weights
(converted via `torch_convert.mm_net_pairs`) on identical batches, and the
first N per-step total-loss values must agree.

What runs on the torch side and where its pieces come from:

- model: the reference `src/UM_Net/MMUNet.py::MM_Net` on the pure-torch
  kernel refs (tests/ref_harness.py), depths truncated to 1/1/1/1;
- scheduler: the reference's OWN `src/optimizer.py::
  LinearWarmupCosineAnnealingLR`, stepped per-epoch exactly as
  `train.py:68` does (`scheduler.step(epoch)`);
- optimizer: `torch.optim.AdamW(lr, betas=(0.9, 0.95), wd=0.05)` with
  timm `create_optimizer_v2`'s default param-group filter (no decay for
  ndim<=1 / *.bias — timm is not installed here; the filter is restated
  from its documented behavior, `train.py:197-199`);
- loss: a torch restatement of MONAI `DiceFocalLoss(smooth_nr=0,
  smooth_dr=1e-5, sigmoid=True)` (`train.py:230-236`) written INDEPENDENTLY
  of the JAX implementation in `mm_unet_tpu/train/losses.py`, so a shared
  misreading of the MONAI formula cannot pass;
- accelerator: a minimal shim (backward/log/print/device) — DDP semantics at
  world size 1 are plain backward.

Controlled differences (documented, both sub-tolerance over N steps):
- dropout is disabled on both sides (torch `p=0`, flax `sideout_drop=0`) —
  rng streams cannot be matched across frameworks;
- the reference's `scheduler.step(epoch)` + chainable-init quirk makes
  epoch e train at lr(e-1) (epoch 0 at `warmup_start_lr`); both sides run
  with `warmup_start_lr = base_lr`, where that off-by-one is a ~1e-8
  relative lr difference (cosine drift over 2 epochs out of 3000);
- timm's filter decays Mamba `A_log` (it is 2-D and timm ignores the
  upstream `_no_weight_decay` tag) while this repo honors the tag
  (`train/optim.py:21`); effect on a 10-step loss trajectory is O(lr·wd·A)
  second-order and measured below tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import ref_harness  # noqa: E402

pytestmark = [
    pytest.mark.skipif(not ref_harness.HAVE_REFERENCE,
                       reason="reference checkout not present"),
    pytest.mark.slow,
]

N_STEPS = 8
LR = 1e-3


class _TorchDiceFocal(torch.nn.Module):
    """MONAI DiceFocalLoss(smooth_nr=0, smooth_dr=1e-5, sigmoid=True) restated
    in torch: per-(sample,channel) dice over spatial dims (mean) + sigmoid
    focal (gamma=2, mean over elements), summed at lambda 1/1."""

    def forward(self, logits, targets):
        p = torch.sigmoid(logits)
        t = targets.to(p.dtype)
        dims = tuple(range(2, p.ndim))
        inter = (p * t).sum(dim=dims)
        denom = p.sum(dim=dims) + t.sum(dim=dims)
        dice = (1.0 - (2.0 * inter + 0.0) / (denom + 1e-5)).mean()
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            logits, t, reduction="none")
        p_t = p * t + (1 - p) * (1 - t)
        focal = (ce * (1 - p_t) ** 2).mean()
        return dice + focal


class _Accel:
    """Minimal Accelerator shim for `train_one_epoch` at world size 1."""

    device = "cpu"
    num_processes = 1

    def backward(self, loss):
        loss.backward()

    def log(self, *a, **k):
        pass

    def print(self, *a, **k):
        pass

    def reduce(self, x):
        return x

    def wait_for_everyone(self):
        pass


def _timm_param_groups(model, weight_decay):
    """timm create_optimizer_v2 default filter: wd=0 for ndim<=1 or *.bias."""
    decay, no_decay = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        (no_decay if p.ndim <= 1 or name.endswith(".bias") else decay).append(p)
    return [
        {"params": decay, "weight_decay": weight_decay},
        {"params": no_decay, "weight_decay": 0.0},
    ]


def test_train_trajectory_vs_reference():
    from mm_unet_tpu.models.mm_unet import MM_Net
    from mm_unet_tpu.train.trainer import (
        create_train_state, make_loss_fn, train_step,
    )
    from mm_unet_tpu.utils import torch_convert as tc
    from mm_unet_tpu.utils.config import ConfigDict

    # ---- reference side ---------------------------------------------------
    rmod = ref_harness.load_ref_model_file("src/UM_Net/MMUNet.py",
                                           name="_ref_mmunet")
    rmod.MMConv.__init__.__defaults__ = tuple(
        "cpu" if d == "cuda" else d for d in rmod.MMConv.__init__.__defaults__
    )
    ropt = ref_harness.load_ref_model_file("src/optimizer.py", name="_ref_optim")
    rtrain = ref_harness.load_ref_trainer()

    torch.manual_seed(0)
    tm = rmod.MM_Net(num_classes=1, num_slices_list=[4, 4, 4, 4])
    import torch.nn as tnn

    tm.encoder2 = tnn.Sequential(tm.encoder2[0])
    tm.encoder3 = tnn.Sequential(tm.encoder3[0])
    tm.encoder4 = tnn.Sequential(tm.encoder4[0])
    tm.encoder5 = tnn.Sequential(tm.encoder5[0])
    for m in tm.modules():  # rng streams can't be matched across frameworks
        if isinstance(m, (tnn.Dropout, tnn.Dropout2d)):
            m.p = 0.0
    tm.train()

    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    y = (rng.uniform(size=(2, 1, 64, 64)) > 0.8).astype(np.float32)
    batch = [torch.from_numpy(x), torch.from_numpy(y)]

    # snapshot the INITIAL weights before the torch side trains — both
    # frameworks must start from this identical init
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}

    optimizer = torch.optim.AdamW(
        _timm_param_groups(tm, 0.05), lr=LR, betas=(0.9, 0.95))
    scheduler = ropt.LinearWarmupCosineAnnealingLR(
        optimizer, warmup_epochs=2, max_epochs=3000, warmup_start_lr=LR)

    recorded = []
    loss_mod = _TorchDiceFocal()

    class _Recorder(torch.nn.Module):
        def forward(self, logits, targets):
            val = loss_mod(logits, targets)
            recorded.append(float(val))
            return val

    import types

    config = types.SimpleNamespace(trainer=types.SimpleNamespace(num_epochs=3000))
    post_trans = lambda z: (torch.sigmoid(z) > 0.5).float()  # noqa: E731

    step = 0
    for epoch in range(N_STEPS):
        step = rtrain.train_one_epoch(
            tm, {"dice_focal_loss": _Recorder()}, [batch], optimizer, scheduler,
            config, {}, post_trans, _Accel(), epoch, step,
            {"dice_focal_loss": 1.0},
        )
    assert len(recorded) == N_STEPS

    # ---- this repo --------------------------------------------------------
    cfg = ConfigDict(trainer=dict(
        lr=LR, warmup=2, num_epochs=3000, weight_decay=0.05,
        steps_per_epoch=1, optimizer="adamw", warmup_start_lr=LR,
    ))
    depths = (1, 1, 1, 1)
    fm = MM_Net(num_classes=1, num_slices_list=(4, 4, 4, 4), depths=depths,
                remat=False, mamba_dtype=None, sideout_drop=0.0)
    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    state = create_train_state(fm, cfg, jax.random.PRNGKey(0), xj)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = tc.apply_pairs(variables, sd0, tc.mm_net_pairs(depths))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])

    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    ours = []
    drop_rng = jax.random.PRNGKey(7)  # unused: dropout disabled
    for _ in range(N_STEPS):
        state, scalars, _ = train_step(state, xj, yj, drop_rng, loss_fn)
        ours.append(float(scalars["total_loss"]))

    # step-0 is pure forward+loss parity at identical weights: tight bound.
    np.testing.assert_allclose(ours[0], recorded[0], rtol=2e-3)
    # Later steps: in the first few Adam updates m_hat/sqrt(v_hat) ~= sign(g),
    # so 1e-6-level cross-framework gradient noise flips whole +-lr update
    # signs — a transient ~1% loss wobble (measured peak 1.3% at steps 2-3,
    # decaying to 0.4% by step 7) that is fp-chaos, not semantics drift.
    # Semantic bugs look different: a wrong lr/wd/beta produces MONOTONE
    # growing divergence, caught by the mean and final bounds below.
    diffs = [abs(o - r) for o, r in zip(ours, recorded)]
    assert max(diffs) <= 1.8e-2, (max(diffs), recorded, ours)
    assert sum(diffs) / len(diffs) <= 8e-3, (sum(diffs) / len(diffs), recorded, ours)
    assert diffs[-1] <= 1e-2, (diffs[-1], recorded, ours)
    # and the reference trajectory must actually be descending (the test is
    # vacuous at lr ~ 0)
    assert recorded[-1] < recorded[0] - 0.05
