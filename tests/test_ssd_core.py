"""SSD (chunked-matmul) scan core tests — flavors, kernel parity, range.

The SSD core (`mm_unet_tpu/ops/ssd_core.py`) replaces the window-decay scan
inside the Pallas kernels for large-D tiles. These tests pin:
1. all four scan flavors against a naive sequential recurrence,
2. the full custom-VJP kernel path (outputs AND gradients) SSD vs
   window-decay on the same inputs,
3. the numerical-range contract: adversarially large dt*|A| must degrade
   gracefully (clip) but NEVER produce NaN/inf.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_unet_tpu.ops.ssd_core import ssd_prefix, ssd_suffix

_LOG2E = 1.4426950408889634


def _data(seed, D, N, T, dt_scale=0.15):
    rng = np.random.default_rng(seed)
    dt = jnp.asarray(dt_scale * np.abs(rng.standard_normal((D, T))), jnp.float32)
    A2 = jnp.asarray(-np.exp(rng.standard_normal((D, N)) * 0.5), jnp.float32)
    b = jnp.asarray(rng.standard_normal((D, N, T)), jnp.float32)
    return dt, A2, b


def _seq_ref(dt, A2, b, exclusive, suffix):
    a = np.exp2(np.asarray(dt)[:, None, :] * np.asarray(A2)[:, :, None])
    bn = np.asarray(b)
    D, N, T = bn.shape
    h = np.zeros((D, N))
    out = np.zeros_like(bn)
    rng_t = range(T - 1, -1, -1) if suffix else range(T)
    for t in rng_t:
        if suffix and exclusive:
            dec = a[..., t]
        elif suffix:
            dec = a[..., t + 1] if t < T - 1 else 1.0
        elif exclusive:
            dec = a[..., t - 1] if t > 0 else 1.0
        else:
            dec = a[..., t]
        h = dec * h + bn[..., t]
        out[..., t] = h
    return out


@pytest.mark.parametrize("exclusive", [False, True])
@pytest.mark.parametrize("suffix", [False, True])
def test_ssd_flavors_vs_sequential(exclusive, suffix):
    dt, A2, b = _data(0, D=4, N=3, T=256)
    fn = ssd_suffix if suffix else ssd_prefix
    got = np.asarray(fn(dt, A2, b, exclusive=exclusive))
    want = _seq_ref(dt, A2, b, exclusive, suffix)
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_ssd_kernel_path_matches_window_decay():
    """Full selective_scan_pallas custom-VJP path: outputs and every gradient
    must agree between the SSD and window-decay cores (large-D grouped
    input engages SSD; MMU_SSD=0 forces the window core)."""
    from mm_unet_tpu.ops import pallas_scan as ps

    rng = np.random.default_rng(3)
    B, D, N, L, G = 2, 64, 16, 700, 2  # dg=32 -> D_blk=32 -> SSD engages
    u = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
    dt = jnp.asarray(0.3 * np.abs(rng.standard_normal((B, D, L))), jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((D, N)) * 0.5), jnp.float32)
    Bv = jnp.asarray(rng.standard_normal((B, G, N, L)), jnp.float32)
    Cv = jnp.asarray(rng.standard_normal((B, G, N, L)), jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((D,)), jnp.float32)

    def run(ssd):
        os.environ["MMU_SSD"] = "1" if ssd else "0"
        ps._scan_core.cache_clear()
        ps._scan_core_fused.cache_clear()

        def loss(*a):
            out = ps.selective_scan_pallas(*a, delta_softplus=True)
            return jnp.sum(out * out), out

        (val, out), grads = jax.value_and_grad(
            loss, argnums=tuple(range(8)), has_aux=True
        )(u, dt, A, Bv, Cv, Dv, z, bias)
        return out, grads

    try:
        o_win, g_win = run(False)
        o_ssd, g_ssd = run(True)
    finally:
        os.environ.pop("MMU_SSD", None)
        ps._scan_core.cache_clear()
        ps._scan_core_fused.cache_clear()
    scale = float(jnp.max(jnp.abs(o_win)))
    np.testing.assert_allclose(np.asarray(o_ssd), np.asarray(o_win),
                               atol=3e-5 * scale)
    for i, (a, b) in enumerate(zip(g_win, g_ssd)):
        sc = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5 * sc, err_msg=f"grad[{i}]")


def test_ssd_extreme_range_no_nan():
    """dt*|A| far beyond the exact domain: the exponent clip must keep every
    output finite (the window-decay kernel's unconditional-stability
    property, preserved by contract)."""
    dt, A2, b = _data(1, D=4, N=4, T=256, dt_scale=4.0)  # |A2|*sum8 >> 123
    for fn, kw in [(ssd_prefix, {}), (ssd_prefix, {"exclusive": True}),
                   (ssd_suffix, {}), (ssd_suffix, {"exclusive": True})]:
        out = np.asarray(fn(dt, A2, b, **kw))
        assert np.isfinite(out).all(), (fn.__name__, kw)
