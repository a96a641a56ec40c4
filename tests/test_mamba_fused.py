"""Parity tests for the fused Mamba-inner kernel (`ops/mamba_fused.py`):
values and ALL gradients vs the unfused composition (causal conv + projections
via einsum + golden selective scan + gate), forward and reversed directions.

Mirrors the reference's fused-vs-unfused test
(`/root/reference/requirements/Mamba/mamba/tests/ops/test_selective_scan.py::test_mamba_inner_fn`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.ops.causal_conv1d import causal_conv1d
from mm_unet_tpu.ops.mamba_fused import mamba_fused_scan
from mm_unet_tpu.ops.selective_scan import selective_scan_ref

ARGNAMES = ["xz", "conv_w", "conv_b", "x_proj", "dt_w", "dt_b", "A", "D"]


def _ref_path(xz, conv_w, conv_b, x_proj, dt_w, dt_b, A, D_skip, reverse):
    x, z = jnp.split(xz, 2, axis=2)
    B, G, D, L = x.shape
    outs = []
    for g in range(G):
        xg, zg = x[:, g], z[:, g]
        if reverse:
            xg, zg = jnp.flip(xg, axis=-1), jnp.flip(zg, axis=-1)
        xg = causal_conv1d(xg, conv_w[g], conv_b[g] if conv_b is not None else None,
                           activation="silu")
        xdbl = jnp.einsum("bdl,ed->bel", xg, x_proj[g])
        R, N = dt_w.shape[2], A.shape[2]
        dt = jnp.einsum("brl,dr->bdl", xdbl[:, :R], dt_w[g])
        y = selective_scan_ref(
            xg, dt, A[g], xdbl[:, R : R + N], xdbl[:, R + N :],
            D=D_skip[g], z=zg, delta_bias=dt_b[g], delta_softplus=True,
        )
        outs.append(jnp.flip(y, axis=-1) if reverse else y)
    return jnp.stack(outs, axis=1)


def _make(D, L, G, seed=0, W=4):
    rng = np.random.default_rng(seed)
    N, R, B = 16, max(1, D // 32), 2
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    xz = jnp.concatenate([f(B, G, D, L) * 0.5, f(B, G, D, L)], axis=2)
    return (
        xz, f(G, D, W) * 0.4, f(G, D) * 0.1,
        f(G, R + 2 * N, D) * (D ** -0.5),
        f(G, D, R) * 0.3, f(G, D) * 0.1, -jnp.exp(f(G, D, N) * 0.5), f(G, D),
    )


def _assert_grads(args, got_shape, reverse, rtol=5e-3, atol=5e-3, seed=1):
    w = jnp.asarray(np.random.default_rng(seed).standard_normal(got_shape), jnp.float32)
    gm = jax.grad(lambda *a: jnp.sum(mamba_fused_scan(*a, reverse=reverse).astype(jnp.float32) * w),
                  argnums=tuple(range(8)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(_ref_path(*a, reverse=reverse) * w),
                  argnums=tuple(range(8)))(*args)
    for name, a, b in zip(ARGNAMES, gm, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=rtol, atol=atol,
            err_msg=f"grad {name}",
        )


@pytest.mark.parametrize("D,L,G,reverse", [
    # the two small params stay UNMARKED so a default (no --runslow) run
    # keeps value+gradient parity coverage of BOTH scan directions of the
    # fused kernel (the reverse path is bi-Mamba's backward scan)
    (16, 96, 1, False),
    (16, 96, 1, True),
    pytest.param(40, 200, 3, False, marks=pytest.mark.slow),
    pytest.param(40, 200, 2, True, marks=pytest.mark.slow),
])
def test_mega_matches_unfused(D, L, G, reverse):
    args = _make(D, L, G)
    got = mamba_fused_scan(*args, reverse=reverse)
    want = _ref_path(*args, reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
    _assert_grads(args, got.shape, reverse)


@pytest.mark.parametrize("D,L,reverse", [
    (16, 1200, False),   # Dp<=24 -> T=1024: 2 chunks
    pytest.param(40, 700, False, marks=pytest.mark.slow),  # T=512: 2 chunks
    pytest.param(16, 1200, True, marks=pytest.mark.slow),
])
def test_mega_multichunk_gradients(D, L, reverse):
    """Gradient parity when L genuinely spans kernel chunks — covers the
    scan's cross-chunk a_e*h_in boundary term AND the in-kernel conv's
    cross-chunk halo/carry terms (taps and dx both cross the chunk edge)."""
    args = _make(D, L, 1, seed=11)
    got = mamba_fused_scan(*args, reverse=reverse)
    want = _ref_path(*args, reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
    _assert_grads(args, got.shape, reverse, seed=12)


def test_mega_no_conv_bias():
    """conv_b=None follows the Mamba conv_bias=False configuration."""
    args = list(_make(16, 96, 1, seed=7))
    args[2] = None  # conv_b
    got = mamba_fused_scan(*args)
    want = _ref_path(*args, reverse=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("W", [2, 3])
def test_mega_conv_widths(W):
    """Non-default conv widths (reference supports 2..4)."""
    args = _make(16, 96, 1, seed=5, W=W)
    got = mamba_fused_scan(*args)
    want = _ref_path(*args, reverse=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_mega_bf16_streams():
    """bf16 inputs follow the production MM_Net configuration."""
    args = _make(24, 128, 2, seed=3)
    bf = [args[0].astype(jnp.bfloat16)] + list(args[1:])
    got = mamba_fused_scan(*bf)
    want = _ref_path(*[a.astype(jnp.float32) for a in bf], reverse=False)
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), np.asarray(want), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize("reverse", [False, True])
def test_mega_bf16_ssd_path(reverse):
    """bf16 streams at D>=64 engage the SSD chunked-matmul core (the
    production RCG configuration: bf16 streams + 1-pass mask dots) — pins
    the precision path the smaller bf16 test (D=24, window-decay) misses."""
    args = _make(64, 256, 1, seed=9)
    bf = [args[0].astype(jnp.bfloat16)] + list(args[1:])
    got = mamba_fused_scan(*bf, reverse=reverse)
    want = _ref_path(*[a.astype(jnp.float32) for a in bf], reverse=reverse)
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), np.asarray(want), rtol=5e-2, atol=5e-2
    )
