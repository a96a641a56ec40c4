"""Sequence-parallel selective scan: values AND gradients must match the
single-device golden reference.

The reference has no cross-device sequence decomposition (SURVEY.md §2.7 —
sequence scaling is within-kernel chunking only); `selective_scan_sp` is the
TPU-native extension that shards L over a mesh axis with a boundary-state
exchange. Its math must be the plain scan's, exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.ops.selective_scan import selective_scan_ref
from mm_unet_tpu.parallel import make_mesh, selective_scan_sp


def _inputs(batch=2, dim=6, n=8, L=64, groups=None, seed=0, with_z=True):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    u = f(batch, dim, L)
    # slow decay + meaningful dt so cross-shard carries matter
    delta = 0.5 * f(batch, dim, L)
    A = -jnp.exp(f(dim, n) * 0.3)
    g = groups or 1
    B = f(batch, g, n, L) if groups else f(batch, n, L)
    C = f(batch, g, n, L) if groups else f(batch, n, L)
    D = f(dim)
    z = f(batch, dim, L) if with_z else None
    dbias = 0.1 * f(dim)
    return u, delta, A, B, C, D, z, dbias


@pytest.mark.parametrize("groups", [None, 2])
@pytest.mark.parametrize("with_z", [True, False])
def test_sp_scan_matches_reference(groups, with_z):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("seq",), devices=jax.devices()[:8])
    u, delta, A, B, C, D, z, dbias = _inputs(groups=groups, with_z=with_z)
    want = selective_scan_ref(u, delta, A, B, C, D, z, dbias, delta_softplus=True)
    got = selective_scan_sp(u, delta, A, B, C, D, z, dbias,
                            delta_softplus=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sp_scan_gradients_match_reference():
    """Gradients w.r.t. every tensor input flow correctly through the
    boundary-state exchange (all_gather + exclusive device prefix)."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("seq",), devices=jax.devices()[:8])
    u, delta, A, B, C, D, z, dbias = _inputs(L=32, dim=4, n=4)

    def loss_ref(args):
        out = selective_scan_ref(*args, delta_softplus=True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_sp(args):
        out = selective_scan_sp(*args, delta_softplus=True, mesh=mesh)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    args = (u, delta, A, B, C, D, z, dbias)
    g_ref = jax.grad(loss_ref)(args)
    g_sp = jax.grad(loss_sp)(args)
    names = ("u", "delta", "A", "B", "C", "D", "z", "delta_bias")
    for name, a, b in zip(names, g_ref, g_sp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_sp_scan_single_device_axis():
    """A 1-sized mesh axis degenerates to the plain scan (no exchange)."""
    mesh = make_mesh(("seq",), devices=jax.devices()[:1])
    u, delta, A, B, C, D, z, dbias = _inputs(L=16)
    want = selective_scan_ref(u, delta, A, B, C, D, z, dbias, delta_softplus=True)
    got = selective_scan_sp(u, delta, A, B, C, D, z, dbias,
                            delta_softplus=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sp_scan_rejects_ragged_L():
    mesh = make_mesh(("seq",), devices=jax.devices()[:8])
    u, delta, A, B, C, D, z, dbias = _inputs(L=60)
    with pytest.raises(ValueError, match="not divisible"):
        selective_scan_sp(u, delta, A, B, C, delta_softplus=True, mesh=mesh)
