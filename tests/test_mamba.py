"""TFM Mamba module tests: shapes, v3 return arity, and numeric parity of the
direction-fused scan against a straightforward per-direction golden built from
the module's own parameters (reference `requirements/mamba_simple.py:185-362`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.models.mamba import Mamba
from mm_unet_tpu.ops.causal_conv1d import causal_conv1d
from mm_unet_tpu.ops.selective_scan import selective_scan_ref


def _golden_direction(xz, p, r, n):
    """Per-direction inner fn using the sequential golden scan."""
    conv_w, conv_b, x_proj, dt_w, dt_b, a_log, d_skip = p
    x, z = jnp.split(xz, 2, axis=1)
    x = causal_conv1d(x, conv_w, conv_b, activation="silu")
    x_dbl = jnp.einsum("bdl,ed->bel", x, x_proj)
    dt = jnp.einsum("brl,dr->bdl", x_dbl[:, :r], dt_w)
    A = -jnp.exp(a_log)
    return selective_scan_ref(
        x, dt, A, x_dbl[:, r : r + n], x_dbl[:, r + n :],
        D=d_skip, z=z, delta_bias=dt_b, delta_softplus=True,
    )


def _golden_v3(params, x, d_model, nslices, d_state=16):
    import math

    d_in = 2 * d_model
    r = math.ceil(d_model / 16)
    B, L, _ = x.shape
    xz = jnp.einsum("bld,ed->bel", x, params["in_proj_weight"])

    def p(sfx):
        return (
            params[f"conv1d{sfx}_weight"], params[f"conv1d{sfx}_bias"],
            params[f"x_proj{sfx}_weight"], params[f"dt_proj{sfx}_weight"],
            params[f"dt_proj{sfx}_bias"], params[f"A{sfx}_log"], params[f"D{sfx}"],
        )

    out_f = _golden_direction(xz, p(""), r, d_state)
    out_b = _golden_direction(jnp.flip(xz, -1), p("_b"), r, d_state)
    ns = nslices
    xz_s = xz.reshape(B, 2 * d_in, ns, L // ns).transpose(0, 1, 3, 2).reshape(B, 2 * d_in, L)
    out_s = _golden_direction(xz_s, p("_s"), r, d_state)
    out_s = out_s.reshape(B, d_in, L // ns, ns).transpose(0, 1, 3, 2).reshape(B, d_in, L)
    y = out_f + jnp.flip(out_b, -1) + out_s
    return jnp.einsum("bdl,ed->ble", y, params["out_proj_weight"])


@pytest.mark.parametrize("d_model,nslices,L", [(3, 4, 64), (8, 2, 48)])
def test_mamba_v3_matches_golden(d_model, nslices, L):
    m = Mamba(d_model=d_model, nslices=nslices, bimamba_type="v3", scan_impl="pallas")
    x = jax.random.normal(jax.random.key(0), (2, L, d_model))
    params = jax.jit(m.init)(jax.random.key(1), x)["params"]
    out, o1, o2, o3 = jax.jit(m.apply)({"params": params}, x)
    assert out.shape == (2, L, d_model)
    assert o1.shape == o2.shape == o3.shape == (2, L, 2 * d_model)[0:1] + (2 * d_model, L)

    golden = jax.jit(_golden_v3, static_argnums=(2, 3))(params, x, d_model, nslices)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden), rtol=6e-4, atol=2e-3)


def test_mamba_v1_treated_as_v3():
    m = Mamba(d_model=3, nslices=4, bimamba_type="v1", scan_impl="assoc")
    x = jax.random.normal(jax.random.key(0), (1, 16, 3))
    vs = jax.jit(m.init)(jax.random.key(1), x)
    out = jax.jit(m.apply)(vs, x)
    assert isinstance(out, tuple) and len(out) == 4


def test_mamba_v2_single_output():
    m = Mamba(d_model=8, bimamba_type="v2", scan_impl="assoc")
    x = jax.random.normal(jax.random.key(0), (1, 24, 8))
    vs = jax.jit(m.init)(jax.random.key(1), x)
    out = jax.jit(m.apply)(vs, x)
    assert out.shape == (1, 24, 8)


def test_mamba_gradients_flow():
    m = Mamba(d_model=3, nslices=4, bimamba_type="v3", scan_impl="pallas")
    x = jax.random.normal(jax.random.key(0), (1, 32, 3))
    vs = jax.jit(m.init)(jax.random.key(1), x)

    def loss(params):
        out, *_ = m.apply({"params": params}, x)
        return jnp.sum(out**2)

    g = jax.jit(jax.grad(loss))(vs["params"])
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)
    # every weight set receives gradient
    total = sum(float(jnp.sum(jnp.abs(t))) for t in flat)
    assert total > 0
    for sfx in ("", "_b", "_s"):
        assert float(jnp.sum(jnp.abs(g[f"A{sfx}_log"]))) > 0


def test_mamba_dt_bias_init_range():
    m = Mamba(d_model=8, bimamba_type="v3", nslices=2)
    x = jax.random.normal(jax.random.key(0), (1, 16, 8))
    params = jax.jit(m.init)(jax.random.key(1), x)["params"]
    dt = jax.nn.softplus(params["dt_proj_bias"])
    assert float(dt.min()) >= 1e-4 * 0.99
    assert float(dt.max()) <= 0.1 * 1.01


@pytest.mark.parametrize("bt", ["v3", "v2", "none"])
def test_mamba_mega_path_matches_legacy(bt):
    """The fused megakernel module path (scan_impl='mega', forced on CPU)
    must match the legacy fused-einsum path parameter-for-parameter."""
    kw = dict(d_model=4, nslices=4, bimamba_type=bt)
    x = jax.random.normal(jax.random.key(0), (2, 32, 4))
    m_legacy = Mamba(scan_impl="assoc", **kw)
    m_mega = Mamba(scan_impl="mega", **kw)
    vs = jax.jit(m_legacy.init)(jax.random.key(1), x)
    out_l = jax.jit(m_legacy.apply)(vs, x)
    out_m = jax.jit(m_mega.apply)(vs, x)
    fl, _ = jax.tree_util.tree_flatten(out_l)
    fm, tm = jax.tree_util.tree_flatten(out_m)
    assert len(fl) == len(fm)
    for a, b in zip(fl, fm):
        if a is None or b is None:
            assert a is b
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3)
