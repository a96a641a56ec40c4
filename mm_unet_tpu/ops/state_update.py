"""Single-token selective-state update for autoregressive decoding.

Replaces the reference Triton kernel
(`/root/reference/requirements/Mamba/mamba/mamba_ssm/ops/triton/selective_state_update.py`):
    state' = state * exp(softplus(dt + dt_bias) * A) + dt * B * x
    y      = C . state' + D * x;  y *= silu(z)
Trivial fused elementwise/jitted JAX — the decode path has no recurrence to
parallelise (one token), so XLA fusion is already optimal on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def selective_state_update(
    state: Array,   # (B, D, N) f32
    x: Array,       # (B, D)
    dt: Array,      # (B, D)
    A: Array,       # (D, N)
    B: Array,       # (B, N)
    C: Array,       # (B, N)
    D: Optional[Array] = None,        # (D,)
    z: Optional[Array] = None,        # (B, D)
    dt_bias: Optional[Array] = None,  # (D,)
    dt_softplus: bool = False,
) -> tuple[Array, Array]:
    """Returns (y (B, D), new_state (B, D, N))."""
    dtype_in = x.dtype
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)[None]
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    dA = jnp.exp(dtf[..., None] * A.astype(jnp.float32)[None])  # (B, D, N)
    dBx = dtf[..., None] * B.astype(jnp.float32)[:, None, :] * x.astype(jnp.float32)[..., None]
    new_state = state.astype(jnp.float32) * dA + dBx
    y = jnp.einsum("bdn,bn->bd", new_state, C.astype(jnp.float32))
    if D is not None:
        y = y + D.astype(jnp.float32)[None] * x.astype(jnp.float32)
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(dtype_in), new_state
