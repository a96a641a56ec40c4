"""Causal conv1d tests — shift-multiply fast path vs conv lowering vs torch
reference semantics (reference harness: `tests/test_causal_conv1d.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update


@pytest.mark.parametrize("W", [2, 3, 4])
@pytest.mark.parametrize("L", [8, 100])
def test_causal_conv_matches_torch(W, L):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    B, D = 2, 6
    x = rng.standard_normal((B, D, L)).astype(np.float32)
    w = rng.standard_normal((D, W)).astype(np.float32)
    b = rng.standard_normal(D).astype(np.float32)

    xt = torch.from_numpy(x)
    wt = torch.from_numpy(w)[:, None, :]
    want = F.conv1d(xt, wt, torch.from_numpy(b), padding=W - 1, groups=D)[..., :L]
    want = F.silu(want).numpy()

    got = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), activation="silu")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_fast_path_matches_conv_lowering():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 12)), jnp.float32)  # W>8 -> conv path
    w4 = w[:, :4]
    ref = jax.lax.conv_general_dilated(
        x, w4[:, None, :], (1,), [(3, 0)], feature_group_count=4,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    got = causal_conv1d(x, w4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_update_consistent_with_full_conv():
    rng = np.random.default_rng(2)
    B, D, W, L = 2, 4, 4, 10
    x = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, W)), jnp.float32)
    full = causal_conv1d(x, w, activation="silu")
    state = jnp.zeros((B, D, W))
    outs = []
    for t in range(L):
        y, state = causal_conv1d_update(x[:, :, t], state, w, activation="silu")
        outs.append(y)
    step = jnp.stack(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full), rtol=1e-5, atol=1e-5)
