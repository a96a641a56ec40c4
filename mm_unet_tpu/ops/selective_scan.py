"""Selective scan (Mamba S6 recurrence) for TPU.

Semantics follow the reference selective-scan op
(`/root/reference/requirements/Mamba/mamba/mamba_ssm/ops/selective_scan_interface.py:86-152`,
`selective_scan_ref`), which itself mirrors the CUDA kernel
(`csrc/selective_scan/selective_scan_fwd_kernel.cuh`):

    delta   = softplus(delta + delta_bias)              (optional)
    a_t     = exp(delta_t * A)                           (B, D, N) per step
    h_t     = a_t * h_{t-1} + delta_t * B_t * u_t        first-order linear recurrence
    y_t     = C_t . h_t  (contract over N)
    out     = y + u * D                                  (optional skip)
    out     = out * silu(z)                              (optional gate)

All state math runs in float32 regardless of input dtype (the CUDA kernel does
the same); the result is cast back to the input dtype.

Three interchangeable implementations:

- ``selective_scan_ref``: `jax.lax.scan` golden reference. Sequential over L,
  used only in tests (the reference repo's `selective_scan_ref` analogue).
- ``_selective_scan_assoc``: `jax.lax.associative_scan` over `(a, b)` pairs with
  the combine `(aL, bL) . (aR, bR) = (aL*aR, bL*aR + bR)` — the same associative
  reformulation the CUDA kernel uses via CUB `InclusiveScan`
  (`selective_scan_common.h:108-141`). Fully differentiable via JAX autodiff.
  Materialises the (B, D, L, N) discretised tensors, so it is only used for
  small problems / CPU.
- Pallas TPU kernel (``mm_unet_tpu.ops.pallas_scan``): chunked scan with carried
  state, never materialising (B, D, L, N); custom VJP with chunk-state
  checkpointing mirroring the CUDA design (chunk states saved for backward,
  within-chunk recompute). Production path on TPU.

The public entry point ``selective_scan`` dispatches between them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Default implementation choice; overridable per-call or globally (tests).
_DEFAULT_IMPL = "auto"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "ref", "assoc", "pallas")
    _DEFAULT_IMPL = impl


def _normalize_BC(x: Array, dim: int) -> tuple[Array, bool]:
    """Normalize B/C to (batch, dim, dstate, L) f32; returns (x, is_variable).

    Accepts (D, N) constant, (B, N, L) variable, or (B, G, N, L) grouped
    variable (reference `selective_scan_ref` B/C shape handling).
    """
    x = x.astype(jnp.float32)
    if x.ndim == 2:  # (D, N) constant
        return x, False
    if x.ndim == 3:  # (B, N, L) -> (B, 1, N, L) group broadcast
        x = x[:, None]
    # (B, G, N, L) -> broadcast groups over dim
    b, g, n, l = x.shape
    if g != dim:
        x = jnp.repeat(x, dim // g, axis=1)
    return x, True


def _prep_delta(delta: Array, delta_bias: Optional[Array], delta_softplus: bool) -> Array:
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    return delta


def _finalize(y: Array, u: Array, D: Optional[Array], z: Optional[Array], dtype) -> Array:
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))  # silu gate
    return y.astype(dtype)


def selective_scan_ref(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
) -> Array | tuple[Array, Array]:
    """Golden sequential reference (lax.scan over L). Test-only.

    Shapes: u/delta (B, D, L); A (D, N); B/C (D, N) | (B, N, L) | (B, G, N, L);
    D (D,); z (B, D, L); delta_bias (D,). Output (B, D, L); last_state (B, D, N).
    """
    dtype_in = u.dtype
    uf = u.astype(jnp.float32)
    delta = _prep_delta(delta, delta_bias, delta_softplus)
    batch, dim, L = uf.shape
    A = A.astype(jnp.float32)
    n = A.shape[1]
    Bm, varB = _normalize_BC(B, dim)
    Cm, varC = _normalize_BC(C, dim)

    def step(h, xs):
        dt, ut, bt, ct = xs  # (B, D), (B, D), (B, D|1, N) | (D, N), ...
        a = jnp.exp(dt[..., None] * A[None])  # (B, D, N)
        if not varB:
            bt = Bm[None]
        db_u = dt[..., None] * bt * ut[..., None]
        h = a * h + db_u
        if not varC:
            ct = Cm[None]
        y = jnp.sum(h * ct, axis=-1)  # (B, D)
        return h, y

    delta_t = jnp.moveaxis(delta, -1, 0)  # (L, B, D)
    u_t = jnp.moveaxis(uf, -1, 0)
    B_t = jnp.moveaxis(Bm, -1, 0) if varB else jnp.zeros((L, 1, 1, 1), jnp.float32)
    C_t = jnp.moveaxis(Cm, -1, 0) if varC else jnp.zeros((L, 1, 1, 1), jnp.float32)
    h0 = jnp.zeros((batch, dim, n), jnp.float32)
    hT, ys = jax.lax.scan(step, h0, (delta_t, u_t, B_t, C_t))
    y = jnp.moveaxis(ys, 0, -1)  # (B, D, L)
    out = _finalize(y, uf, D, z, dtype_in)
    if return_last_state:
        return out, hT
    return out


def _assoc_combine(left, right):
    aL, bL = left
    aR, bR = right
    return aL * aR, bL * aR + bR


def _selective_scan_assoc_core(u, delta, A, Bm, varB, Cm, varC):
    """Core scan via jax.lax.associative_scan. u/delta (B,D,L) f32.

    Returns (y (B,D,L) f32, last_state (B,D,N) f32). Materialises (B,D,L,N)
    intermediates — fallback path for CPU / small problems.
    """
    # a_t = exp(delta_t A); b_t = delta_t B_t u_t, shapes (B, D, L, N)
    a = jnp.exp(delta[..., None] * A[None, :, None, :])
    if varB:
        bt = jnp.moveaxis(Bm, -1, 2)  # (B, D, L, N)
    else:
        bt = Bm[None, :, None, :]
    b = delta[..., None] * bt * u[..., None]
    a_sc, h = jax.lax.associative_scan(_assoc_combine, (a, jnp.broadcast_to(b, a.shape)), axis=2)
    del a_sc
    if varC:
        ct = jnp.moveaxis(Cm, -1, 2)
    else:
        ct = Cm[None, :, None, :]
    y = jnp.sum(h * ct, axis=-1)  # (B, D, L)
    return y, h[:, :, -1, :]


def selective_scan(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    implementation: Optional[str] = None,
) -> Array | tuple[Array, Array]:
    """Selective scan with automatic TPU (Pallas) / fallback dispatch.

    Mirrors the reference `selective_scan_fn`
    (`selective_scan_interface.py:78-84`): same inputs/outputs, differentiable
    in all tensor arguments. `return_last_state` returns `(out, last_state)`
    where last_state is (B, D, N) (gradient does not flow through last_state,
    matching the reference).
    """
    import os

    impl = os.environ.get("MMU_SCAN_IMPL") or implementation or _DEFAULT_IMPL
    if impl == "bypass":  # profiling ablation: skip the recurrence entirely
        out = _finalize(u.astype(jnp.float32), u.astype(jnp.float32), D, z, u.dtype)
        if return_last_state:
            return out, jnp.zeros((u.shape[0], u.shape[1], A.shape[1]), jnp.float32)
        return out
    if impl == "auto":
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        impl = "pallas" if on_tpu else "assoc"

    if impl == "ref":
        return selective_scan_ref(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus, return_last_state
        )

    if impl == "pallas":
        from mm_unet_tpu.ops.pallas_scan import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus, return_last_state
        )

    dtype_in = u.dtype
    uf = u.astype(jnp.float32)
    deltaf = _prep_delta(delta, delta_bias, delta_softplus)
    Af = A.astype(jnp.float32)
    dim = Af.shape[0]
    Bm, varB = _normalize_BC(B, dim)
    Cm, varC = _normalize_BC(C, dim)
    y, last = _selective_scan_assoc_core(uf, deltaf, Af, Bm, varB, Cm, varC)
    out = _finalize(y, uf, D, z, dtype_in)
    if return_last_state:
        return out, jax.lax.stop_gradient(last)
    return out
