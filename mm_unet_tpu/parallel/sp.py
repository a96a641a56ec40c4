"""Sequence parallelism: the selective scan sharded across chips.

SURVEY.md §2.7 notes the reference has NO cross-device sequence
decomposition — its only sequence scaling is within-kernel chunking
(`selective_scan_fwd_kernel.cuh:131-258`) and the nslices layout trick —
and names "a sharded associative scan with boundary-state exchange" as the
optional TPU extension. This module is that extension.

The recurrence ``h_t = a_t h_{t-1} + b_t`` splits over devices the same way
the kernel splits it over chunks: each device scans its local token shard
with zero initial state, devices exchange boundary states, and each shard
adds the closed-form contribution of the incoming state:

1. local scan (zero init) → ``y_loc``, final local state ``h_end`` and the
   shard's total decay ``a_tot = exp(A·Σdelta)``;
2. one ``all_gather`` of the (tiny) ``(h_end, a_tot)`` pairs over the mesh
   axis, then every device evaluates the exclusive prefix recurrence
   ``h_in_i = a_tot_{i-1}·h_in_{i-1} + h_end_{i-1}`` (n_dev is static, the
   loop unrolls; communication is one collective of B·D·N floats per pair —
   the "boundary-state exchange");
3. correction ``y_t += C_t · (h_in · exp(A·cumsum(delta)_t))`` — the
   incoming state decayed to every local position (rank-1 in the exponent,
   the same window-decay identity the Pallas kernel uses across chunks).

Everything is ordinary differentiable JAX inside `shard_map`, so gradients
flow through the boundary exchange (all_gather transposes to psum_scatter)
and the SAME code runs on any mesh axis size, 1 included.

The local scan uses the associative-scan core (differentiable last state);
this path targets long-context workloads where L is sharded precisely
because one chip can't hold it — per-chip L drops by n, and with it the
(B,D,L/n,N) materialisation. The flagship's image-token scans stay on the
single-chip Pallas megakernel (faster at sizes that fit).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mm_unet_tpu.ops.selective_scan import (_finalize, _normalize_BC,
                                            _prep_delta,
                                            _selective_scan_assoc_core)

Array = jax.Array


def _sp_shard_body(u, delta, A, Bc, Cc, axis_name: str):
    """Per-shard body: local scan + boundary-state exchange + correction.

    u/delta (B, D, Lloc) f32, delta already bias/softplus-prepped;
    A (D, N) f32; Bc/Cc (B, G, N, Lloc) f32 (grouped-variable layout).
    Returns y (B, D, Lloc) f32 — the gate/skip epilogue happens outside.
    """
    dim = u.shape[1]
    Bm, varB = _normalize_BC(Bc, dim)
    Cm, varC = _normalize_BC(Cc, dim)
    y_loc, h_end = _selective_scan_assoc_core(u, delta, A, Bm, varB, Cm, varC)

    # shard total decay: exp(A * sum(delta)) per (B, D, N)
    s = jnp.cumsum(delta, axis=-1)  # (B, D, Lloc) inclusive
    a_tot = jnp.exp(s[..., -1][..., None] * A[None])  # (B, D, N)

    n_dev = jax.lax.axis_size(axis_name)
    if n_dev == 1:
        return y_loc
    # boundary-state exchange: gather every shard's (h_end, a_tot) …
    h_all = jax.lax.all_gather(h_end, axis_name)  # (n, B, D, N)
    a_all = jax.lax.all_gather(a_tot, axis_name)
    # … and run the exclusive prefix recurrence over the (static) device axis
    h_in_list = [jnp.zeros_like(h_end)]
    for i in range(1, n_dev):
        h_in_list.append(a_all[i - 1] * h_in_list[i - 1] + h_all[i - 1])
    h_in = jnp.stack(h_in_list)[jax.lax.axis_index(axis_name)]  # (B, D, N)

    # correction: the incoming state decayed to every local position
    decay = jnp.exp(s[..., None] * A[None, :, None, :])  # (B, D, Lloc, N)
    ct = jnp.moveaxis(Cm, -1, 2) if varC else Cm[None, :, None, :]
    y_corr = jnp.sum(ct * h_in[:, :, None, :] * decay, axis=-1)
    return y_loc + y_corr


def selective_scan_sp(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    *,
    mesh: Mesh,
    axis: str = "seq",
) -> Array:
    """Selective scan with the L axis sharded over `mesh.shape[axis]` chips.

    Same tensor contract as `mm_unet_tpu.ops.selective_scan.selective_scan`
    (u/delta/z (B, D, L); A (D, N); B/C (B, N, L) or (B, G, N, L) variable —
    constant (D, N) B/C is not supported here; D (D,); delta_bias (D,)),
    numerically equal to the single-device op and differentiable in all
    tensor arguments. Requires L % mesh.shape[axis] == 0.
    """
    n = mesh.shape[axis]
    L = u.shape[-1]
    if L % n:
        raise ValueError(f"seq len {L} not divisible by mesh axis {axis}={n}")
    if B.ndim == 2 or C.ndim == 2:
        raise ValueError("sequence-parallel scan needs variable (B,[G,]N,L) B/C")

    dtype_in = u.dtype
    uf = u.astype(jnp.float32)
    deltaf = _prep_delta(delta, delta_bias, delta_softplus)
    Af = A.astype(jnp.float32)
    B4 = (B if B.ndim == 4 else B[:, None]).astype(jnp.float32)
    C4 = (C if C.ndim == 4 else C[:, None]).astype(jnp.float32)

    seq3 = P(None, None, axis)
    seq4 = P(None, None, None, axis)
    body = jax.shard_map(
        partial(_sp_shard_body, axis_name=axis),
        mesh=mesh,
        in_specs=(seq3, seq3, P(), seq4, seq4),
        out_specs=seq3,
    )
    # jit the sharded body: eager-mode shard_map transposition (grad without
    # an enclosing jit) hits an XLA sharding-override assert in current JAX;
    # under jit the same grad is exact. Inlined when already inside a jit.
    y = jax.jit(body)(uf, deltaf, Af, B4, C4)
    return _finalize(y, uf, D, z, dtype_in)
