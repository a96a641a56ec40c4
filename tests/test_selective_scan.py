"""Parity tests for the selective scan: Pallas kernel (interpret mode) and
associative-scan path vs the sequential golden reference — values AND all
gradients, with dtype-scaled tolerances.

Harness modeled on the reference kernel tests
(`/root/reference/requirements/Mamba/mamba/tests/ops/test_selective_scan.py`):
fast kernel vs slow reference on random tensors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# the ops package re-exports same-named functions, shadowing the submodules
_ss_mod = importlib.import_module("mm_unet_tpu.ops.selective_scan")
_ps_mod = importlib.import_module("mm_unet_tpu.ops.pallas_scan")

# jit the ops under test: one cached XLA compile per signature instead of
# eager per-op dispatch (the persistent compilation cache makes repeat CI
# runs hit these instantly)
selective_scan_ref = jax.jit(
    _ss_mod.selective_scan_ref,
    static_argnames=("delta_softplus", "return_last_state"),
)
selective_scan = jax.jit(
    _ss_mod.selective_scan,
    static_argnames=("delta_softplus", "return_last_state", "implementation"),
)
selective_scan_pallas = jax.jit(
    _ps_mod.selective_scan_pallas,
    static_argnames=("delta_softplus", "return_last_state", "chunk", "interpret"),
)


def _make_inputs(rng, batch, dim, L, N, varBC=True, has_D=True, has_z=True,
                 has_bias=True, itype=np.float32):
    u = rng.standard_normal((batch, dim, L)).astype(itype)
    delta = (0.5 * rng.standard_normal((batch, dim, L))).astype(itype)
    A = (-np.exp(rng.standard_normal((dim, N)).astype(np.float32) * 0.5)).astype(np.float32)
    if varBC:
        B = rng.standard_normal((batch, N, L)).astype(itype)
        C = rng.standard_normal((batch, N, L)).astype(itype)
    else:
        B = rng.standard_normal((dim, N)).astype(np.float32)
        C = rng.standard_normal((dim, N)).astype(np.float32)
    D = rng.standard_normal(dim).astype(np.float32) if has_D else None
    z = rng.standard_normal((batch, dim, L)).astype(itype) if has_z else None
    bias = (0.1 * rng.standard_normal(dim)).astype(np.float32) if has_bias else None
    return u, delta, A, B, C, D, z, bias


def _loss(fn, args):
    def wrapped(u, delta, A, B, C, D, z, bias):
        out = fn(u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 0.01))
    return wrapped


@pytest.mark.parametrize("L", [8, 64, 256, 372, 1024])
@pytest.mark.parametrize("impl", ["assoc", "pallas"])
def test_scan_forward_parity(L, impl):
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 6, L, 16)
    ref = selective_scan_ref(u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True)
    if impl == "pallas":
        out = selective_scan_pallas(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                                    delta_softplus=True, chunk=128)
    else:
        out = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                             delta_softplus=True, implementation="assoc")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("has_D,has_z,has_bias", [(True, True, True), (False, False, False),
                                                   (True, False, True)])
def test_scan_forward_options(has_D, has_z, has_bias):
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 10, 200, 8,
                                                 has_D=has_D, has_z=has_z, has_bias=has_bias)
    ref = selective_scan_ref(u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True)
    out = selective_scan_pallas(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                                delta_softplus=True, chunk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_scan_constant_BC_falls_back():
    rng = np.random.default_rng(2)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 4, 64, 8, varBC=False)
    ref = selective_scan_ref(u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True)
    out = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                         delta_softplus=True, implementation="assoc")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_scan_last_state():
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 6, 100, 16)
    ref, ref_last = selective_scan_ref(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                                       delta_softplus=True, return_last_state=True)
    out, last = selective_scan_pallas(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                                      delta_softplus=True, return_last_state=True, chunk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(last), np.asarray(ref_last), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("L", [96, 372])
@pytest.mark.parametrize("impl", ["assoc", "pallas"])
def test_scan_gradients(L, impl):
    rng = np.random.default_rng(4)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 6, L, 16)

    if impl == "pallas":
        fn = lambda *a, **k: selective_scan_pallas(*a, **k, chunk=128)  # noqa: E731
    else:
        fn = lambda *a, **k: selective_scan(*a, **k, implementation="assoc")  # noqa: E731

    gref = jax.jit(jax.grad(_loss(selective_scan_ref, None), argnums=(0, 1, 2, 3, 4, 5, 6, 7)))(
        u, delta, A, B, C, D, z, bias)
    gout = jax.jit(jax.grad(_loss(fn, None), argnums=(0, 1, 2, 3, 4, 5, 6, 7)))(
        u, delta, A, B, C, D, z, bias)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz", "dbias"]
    for name, a, b in zip(names, gout, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                                   err_msg=name)


@pytest.mark.parametrize("has_z", [True, False])
def test_scan_gradients_multichunk(has_z):
    """Gradient parity across REAL chunk boundaries (regression for the
    dropped a0*h_in boundary term in ddt/dA).

    dim=16 keeps D_blk > 8 so chunk=128 is NOT bumped to 1024: L=372 spans
    3 chunks. Slow decay (small |A|, large dt) makes the cross-chunk carries
    significant. has_z toggles the fused vs plain backward kernel.
    """
    rng = np.random.default_rng(7)
    batch, dim, L, N = 2, 16, 372, 16
    u = rng.standard_normal((batch, dim, L)).astype(np.float32)
    delta = (1.0 + 0.3 * rng.standard_normal((batch, dim, L))).astype(np.float32)
    A = (-np.exp(rng.standard_normal((dim, N)).astype(np.float32) * 0.3 - 2.0)).astype(np.float32)
    B = rng.standard_normal((batch, N, L)).astype(np.float32)
    C = rng.standard_normal((batch, N, L)).astype(np.float32)
    D = rng.standard_normal(dim).astype(np.float32)
    z = rng.standard_normal((batch, dim, L)).astype(np.float32) if has_z else None
    bias = (0.1 * rng.standard_normal(dim)).astype(np.float32)

    argnums = (0, 1, 2, 3, 4, 5, 6, 7) if has_z else (0, 1, 2, 3, 4, 5, 7)
    names = (["du", "ddelta", "dA", "dB", "dC", "dD", "dz", "dbias"] if has_z
             else ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"])
    fn = lambda *a, **k: selective_scan_pallas(*a, **k, chunk=128)  # noqa: E731
    gref = jax.jit(jax.grad(_loss(selective_scan_ref, None), argnums=argnums))(
        u, delta, A, B, C, D, z, bias)
    gout = jax.jit(jax.grad(_loss(fn, None), argnums=argnums))(
        u, delta, A, B, C, D, z, bias)
    for name, a, b in zip(names, gout, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                                   err_msg=name)


def test_scan_bf16_tolerances():
    rng = np.random.default_rng(5)
    u, delta, A, B, C, D, z, bias = _make_inputs(rng, 2, 8, 256, 16)
    ub, db = jnp.bfloat16(u), jnp.bfloat16(delta)
    Bb, Cb, zb = jnp.bfloat16(B), jnp.bfloat16(C), jnp.bfloat16(z)
    ref = selective_scan_ref(ub, db, A, Bb, Cb, D=D, z=zb, delta_bias=bias, delta_softplus=True)
    out = selective_scan_pallas(ub, db, A, Bb, Cb, D=D, z=zb, delta_bias=bias,
                                delta_softplus=True, chunk=128)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32), rtol=3e-2, atol=5e-2)


@pytest.mark.parametrize("G", [2, 3])
def test_scan_grouped_BC(G):
    """Grouped B/C: channel group g uses stream g (direction-fused scan)."""
    rng = np.random.default_rng(6)
    B_, dg, L, N = 2, 6, 200, 16
    dim = G * dg
    u = rng.standard_normal((B_, dim, L)).astype(np.float32)
    delta = (0.5 * rng.standard_normal((B_, dim, L))).astype(np.float32)
    A = (-np.exp(rng.standard_normal((dim, N)) * 0.5)).astype(np.float32)
    Bv = rng.standard_normal((B_, G, N, L)).astype(np.float32)
    Cv = rng.standard_normal((B_, G, N, L)).astype(np.float32)
    ref = selective_scan_ref(u, delta, A, Bv, Cv, delta_softplus=True)
    out = selective_scan_pallas(u, delta, A, Bv, Cv, delta_softplus=True, chunk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def loss(fn):
        def f(u, delta, A, Bv, Cv):
            o = fn(u, delta, A, Bv, Cv, delta_softplus=True)
            return jnp.sum(jnp.sin(o))
        return f

    gref = jax.jit(jax.grad(loss(selective_scan_ref), argnums=(0, 1, 2, 3, 4)))(u, delta, A, Bv, Cv)
    gout = jax.jit(jax.grad(loss(lambda *a, **k: selective_scan_pallas(*a, **k, chunk=128)),
                            argnums=(0, 1, 2, 3, 4)))(u, delta, A, Bv, Cv)
    for name, a, b in zip(["du", "ddelta", "dA", "dB", "dC"], gout, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                                   err_msg=name)
