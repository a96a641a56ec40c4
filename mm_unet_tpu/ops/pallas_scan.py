"""Pallas TPU kernel for the selective-scan (Mamba S6) recurrence.

TPU-first redesign of the reference CUDA kernels
(`/root/reference/requirements/Mamba/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh`
and `selective_scan_bwd_kernel.cuh`):

- The recurrence `h_t = a_t h_{t-1} + b_t` is computed as a **chunked
  window-decay (log-depth) scan along the lane axis**: the sequence is
  processed in chunks of `T` tokens (CUDA `kChunkSize`,
  `selective_scan_fwd_kernel.cuh:131`), the running prefix state is carried
  across chunks in VMEM scratch (CUDA carries it in shared memory,
  `:95,240-258`), and per-chunk entry states are saved to HBM for the backward
  pass (CUDA writes them to `x`, `:109,255-257`). Because the decay is
  exponential with a rank-1 exponent (`a_t = exp(Δ_t·A)`), each
  Hillis–Steele pass's window products are `exp2(A · window_sum(Δ))` with
  the window sums built by progressive doubling on the 2-D Δ tile — so the
  pair-scan's a-stream (half of all full-size lane rolls, which dominate
  kernel time: measured 50.5 ms rolls-only vs 16.2 ms arith-only in a
  50.4 ms kernel) reduces to rolls N× smaller. Measured ≥1.4× kernel
  speedup at RCG shapes.
- The backward pass re-processes chunks in **reverse grid order**, recomputes
  the intra-chunk forward states from the saved chunk-entry state, and runs a
  reverse (suffix) scan for the adjoint state — the same structure as CUDA's
  `BlockReverseScan` (`selective_scan_bwd_kernel.cuh:271,364`).
- The discretised tensors `exp(Δ·A)` and `Δ·B·u` of logical shape (B, D, L, N)
  are **never materialised in HBM**; they exist one (D_blk, N, T) tile at a
  time in VMEM. State math is float32 (as in CUDA); inputs may be bf16.

Layout: within a chunk all working arrays are (D_blk, N, T) — N on sublanes,
T on lanes, D_blk as the looped leading dim — so every scan step is a full-tile
VPU op and the combine runs in log2(T) steps instead of T sequential steps.

Only the *core* scan (u, Δ, A, B, C → y) is inside the kernel/custom-VJP
boundary; Δ-bias/softplus, the D-skip and the silu(z) gate are cheap
elementwise ops left to XLA, which fuses them with the surrounding
transposes/casts (their VJPs come for free from JAX autodiff).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm_unet_tpu.ops.selective_scan import _finalize, _prep_delta
from mm_unet_tpu.ops.ssd_core import ssd_prefix, ssd_suffix

Array = jax.Array

DEFAULT_CHUNK = 512  # swept 128/256/512/1024 on v5e: 512 fastest fwd and fwd+bwd

_LOG2E = 1.4426950408889634  # exp(x) == exp2(x*log2e); exp2 is cheaper on the VPU


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Window-sum masked to _BIG makes exp2(A2 * _BIG) == 0 for any A < 0, which
# both kills the wrapped roll values and replaces full-size select masks.
# Padded channels have A == 0 (exp2 -> 1) but also u == dt == 0, so their
# wrapped contributions are exactly zero anyway.
_BIG = 1e30


def _window_scan_fwd(dt: Array, A2: Array, b: Array) -> Array:
    """Inclusive scan h_t = a_t h_{t-1} + b_t along lanes (axis=2) where the
    decay is exponential with a rank-1 exponent: a_t = exp2(A2 * dt_t),
    dt 2-D (D_blk, T), A2 (D_blk, N), b (D_blk, N, T).

    Key TPU trick: the Hillis–Steele window products prod_{q=t-s+1..t} a_q
    equal exp2(A2 * ws_s[t]) with ws_s[t] = sum_{q=t-s+1..t} dt_q, built by
    progressive doubling (ws_{2s} = ws_s + roll(ws_s, s)) on the 2-D dt tile.
    The classic pair-scan's a-stream — half of all full-size lane rolls,
    which dominate kernel time (measured: rolls-only 50.5 ms vs arith-only
    16.2 ms in a 50.4 ms kernel) — thus shrinks to rolls N x smaller.
    Out-of-range windows get a _BIG sum -> decay 0, masking the wrapped roll
    values with no full-size select. Window sums of positive dt are
    cancellation-free (more accurate than cumsum differences).
    """
    T = b.shape[2]
    col2 = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    ws = dt
    s = 1
    while s < T:
        wm = jnp.where(col2 >= s, ws, _BIG)
        b = jnp.exp2(wm[:, None, :] * A2[:, :, None]) * pltpu.roll(b, s, axis=2) + b
        if s * 2 < T:
            ws = ws + pltpu.roll(ws, s, axis=1)
        s *= 2
    return b


def _window_scan_rev(dt: Array, A2: Array, g: Array) -> Array:
    """Suffix scan g_t = sum_{r>=t} (prod_{q=t+1..r} a_q) g_r — the adjoint
    recurrence g_t = a_{t+1} g_{t+1} + ginit_t with the cross-chunk boundary
    folded into ginit[T-1] by the caller. Suffix window sums
    vs_s[t] = sum_{q=t+1..t+s} dt_q stay within the chunk and double as
    vs_{2s} = vs_s + roll_left(vs_s, s)."""
    T = g.shape[2]
    col2 = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    vs = pltpu.roll(dt, T - 1, axis=1)  # vs_1[t] = dt[t+1]
    s = 1
    while s < T:
        wm = jnp.where(col2 < T - s, vs, _BIG)
        g = g + jnp.exp2(wm[:, None, :] * A2[:, :, None]) * pltpu.roll(g, T - s, axis=2)
        if s * 2 < T:
            vs = vs + pltpu.roll(vs, T - s, axis=1)
        s *= 2
    return g


def _core_pair(ssd: bool):
    """(prefix, suffix) scan cores: SSD chunked-matmul (large-D tiles,
    MXU; see ops/ssd_core.py) or the window-decay Hillis-Steele pair."""
    if ssd:
        return (lambda dt, A2, b: ssd_prefix(dt, A2, b),
                lambda dt, A2, g: ssd_suffix(dt, A2, g))
    return _window_scan_fwd, _window_scan_rev


def _make_fwd_kernel(scan_fwd):
  def _fwd_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, y_ref, st_ref, last_ref, h_ref):
      """One (batch b, dim-block s, chunk l) grid step of the forward scan.

      h_ref: (D_blk, N, 1) f32 scratch carrying the running state across chunks.
      """
      li = pl.program_id(2)
      nl = pl.num_programs(2)

      @pl.when(li == 0)
      def _():
          h_ref[...] = jnp.zeros_like(h_ref)

      # Save the chunk-entry state for the backward pass (CUDA: x buffer).
      st_ref[0] = h_ref[...]

      u = u_ref[0].astype(jnp.float32)  # (D_blk, T)
      dt = dt_ref[0].astype(jnp.float32)  # (D_blk, T)
      Bv = B_ref[0, 0].astype(jnp.float32)  # (N, T)
      Cv = C_ref[0, 0].astype(jnp.float32)  # (N, T)
      A2 = A_ref[...].astype(jnp.float32) * _LOG2E  # (D_blk, N)

      b = (dt * u)[:, None, :] * Bv[None, :, :]  # (D_blk, N, T)

      # fold the cross-chunk carry into b[0] (masked add fuses; a concat
      # materialises a full copy): h_t = scan(a, b) with h_{-1}=0. Only the
      # first token's decay a_0 is needed — a full-size a is never formed.
      a0 = jnp.exp2(dt[:, :1][:, None, :] * A2[:, :, None])  # (D_blk, N, 1)
      col0 = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2) == 0
      b = b + jnp.where(col0, a0 * h_ref[...], 0.0)
      h = scan_fwd(dt, A2, b)
      y_ref[0] = jnp.sum(h * Cv[None, :, :], axis=1).astype(y_ref.dtype)
      h_ref[...] = h[:, :, -1:]

      @pl.when(li == nl - 1)
      def _():
          last_ref[0] = h_ref[...]

  return _fwd_kernel


def _make_bwd_kernel(scan_fwd, scan_rev):
  def _bwd_kernel(
      u_ref, dt_ref, A_ref, B_ref, C_ref, st_ref, dy_ref,
      du_ref, ddt_ref, dA_ref, dB_ref, dC_ref,
      g_ref, af_ref,
  ):
      """One (b, s, reversed chunk) grid step of the backward scan.

      g_ref: (D_blk, N, 1) adjoint-state carry dL/dh at the later chunk's first
      timestep; af_ref: (D_blk, N, 1) the decay a at that timestep.
      """
      li = pl.program_id(2)  # 0 = last chunk (specs map to reversed order)
      nl = pl.num_programs(2)

      @pl.when(li == 0)
      def _():
          g_ref[...] = jnp.zeros_like(g_ref)
          af_ref[...] = jnp.zeros_like(af_ref)

      u = u_ref[0].astype(jnp.float32)
      dt = dt_ref[0].astype(jnp.float32)
      Bv = B_ref[0, 0].astype(jnp.float32)
      Cv = C_ref[0, 0].astype(jnp.float32)
      A = A_ref[...].astype(jnp.float32)
      dy = dy_ref[0].astype(jnp.float32)  # (D_blk, T)
      h_in = st_ref[0]  # (D_blk, N, 1) chunk-entry state

      A2 = A * _LOG2E
      dtu = dt * u  # (D_blk, T)
      b = dtu[:, None, :] * Bv[None, :, :]

      # Recompute intra-chunk states (checkpoint recompute, CUDA bwd does same).
      a0 = jnp.exp2(dt[:, :1][:, None, :] * A2[:, :, None])  # first-token decay
      col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
      b_folded = b + jnp.where(col == 0, a0 * h_in, 0.0)
      h = scan_fwd(dt, A2, b_folded)

      # Adjoint state: g_t = C_t dy_t + a_{t+1} g_{t+1}; a_{t+1} at the chunk
      # boundary is the previously processed (later) chunk's first decay
      # (af_ref); the boundary term af * g_carry folds into ginit[T-1].
      T = b.shape[2]
      ginit = dy[:, None, :] * Cv[None, :, :] + jnp.where(
          col == T - 1, af_ref[...] * g_ref[...], 0.0
      )
      g = scan_rev(dt, A2, ginit)

      # Update carries for the next (earlier) chunk.
      g_ref[...] = g[:, :, :1]
      af_ref[...] = a0

      gB = jnp.sum(g * Bv[None, :, :], axis=1)  # (D_blk, T)
      # a*h_prev == h - b with the PRE-fold b: at every interior position
      # h_t = a_t h_{t-1} + b_t, and at the chunk entry h_0 - b_0 = a_0*h_in
      # (the carry folded into b_folded[0]). Using b_folded here would zero the
      # boundary term a_0*h_in and drop the cross-chunk ddt/dA gradient.
      gah = g * (h - b)  # (D_blk, N, T)

      du_ref[0] = (dt * gB).astype(du_ref.dtype)
      ddt_ref[0] = (
          jnp.sum(gah * A[:, :, None], axis=1) + u * gB
      ).astype(ddt_ref.dtype)
      dB_ref[0, 0] = jnp.sum(g * dtu[:, None, :], axis=0).astype(dB_ref.dtype)
      dC_ref[0, 0] = jnp.sum(h * dy[:, None, :], axis=0).astype(dC_ref.dtype)

      @pl.when(li == 0)
      def _():
          dA_ref[0] = jnp.zeros_like(dA_ref[0])

      dA_ref[0] += jnp.sum(gah * dt[:, None, :], axis=2, keepdims=True)

  return _bwd_kernel


def _make_fwd_kernel_fused(scan_fwd):
  def _fwd_kernel_fused(
      u_ref, dtr_ref, A_ref, B_ref, C_ref, bias_ref, Dv_ref, z_ref,
      out_ref, st_ref, h_ref,
  ):
      """Fused forward: delta softplus prologue and D-skip + silu(z)-gate
      epilogue run inside the kernel (profiling showed the XLA-side prep and
      finalize elementwise fusions around each scan cost ~24 ms/step)."""
      li = pl.program_id(2)

      @pl.when(li == 0)
      def _():
          h_ref[...] = jnp.zeros_like(h_ref)

      st_ref[0] = h_ref[...]

      u = u_ref[0].astype(jnp.float32)  # (D_blk, T)
      raw = dtr_ref[0].astype(jnp.float32) + bias_ref[...]  # (D_blk, T)
      dt = jax.nn.softplus(raw)
      Bv = B_ref[0, 0].astype(jnp.float32)
      Cv = C_ref[0, 0].astype(jnp.float32)
      A2 = A_ref[...].astype(jnp.float32) * _LOG2E

      b = (dt * u)[:, None, :] * Bv[None, :, :]
      a0 = jnp.exp2(dt[:, :1][:, None, :] * A2[:, :, None])
      col0 = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2) == 0
      b = b + jnp.where(col0, a0 * h_ref[...], 0.0)
      h = scan_fwd(dt, A2, b)
      y = jnp.sum(h * Cv[None, :, :], axis=1) + Dv_ref[...] * u
      z = z_ref[0].astype(jnp.float32)
      out_ref[0] = (y * (z * jax.nn.sigmoid(z))).astype(out_ref.dtype)
      h_ref[...] = h[:, :, -1:]

  return _fwd_kernel_fused


def _make_bwd_kernel_fused(scan_fwd, scan_rev):
  def _bwd_kernel_fused(
      u_ref, dtr_ref, A_ref, B_ref, C_ref, bias_ref, Dv_ref, z_ref, st_ref, dout_ref,
      du_ref, ddtr_ref, dA_ref, dB_ref, dC_ref, dD_ref, dz_ref,
      g_ref, af_ref,
  ):
      """Fused backward: recomputes the gated epilogue, emits dz and dD and
      chains the softplus gradient into ddt_raw."""
      li = pl.program_id(2)

      @pl.when(li == 0)
      def _():
          g_ref[...] = jnp.zeros_like(g_ref)
          af_ref[...] = jnp.zeros_like(af_ref)

      u = u_ref[0].astype(jnp.float32)
      raw = dtr_ref[0].astype(jnp.float32) + bias_ref[...]
      sig_raw = jax.nn.sigmoid(raw)
      dt = jax.nn.softplus(raw)
      Bv = B_ref[0, 0].astype(jnp.float32)
      Cv = C_ref[0, 0].astype(jnp.float32)
      A = A_ref[...].astype(jnp.float32)
      Dv = Dv_ref[...]
      dout = dout_ref[0].astype(jnp.float32)
      h_in = st_ref[0]

      A2 = A * _LOG2E
      dtu = dt * u
      b = dtu[:, None, :] * Bv[None, :, :]
      a0 = jnp.exp2(dt[:, :1][:, None, :] * A2[:, :, None])
      col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
      b_folded = b + jnp.where(col == 0, a0 * h_in, 0.0)
      h = scan_fwd(dt, A2, b_folded)

      # gate epilogue gradients
      z = z_ref[0].astype(jnp.float32)
      sz = jax.nn.sigmoid(z)
      silu = z * sz
      y_pre = jnp.sum(h * Cv[None, :, :], axis=1) + Dv * u
      dy = dout * silu
      dz_ref[0] = (dout * y_pre * (sz + silu * (1.0 - sz))).astype(dz_ref.dtype)

      T = b.shape[2]
      ginit = dy[:, None, :] * Cv[None, :, :] + jnp.where(
          col == T - 1, af_ref[...] * g_ref[...], 0.0
      )
      g = scan_rev(dt, A2, ginit)

      g_ref[...] = g[:, :, :1]
      af_ref[...] = a0

      gB = jnp.sum(g * Bv[None, :, :], axis=1)
      # g*a*h_prev via the PRE-fold b: h - b == a*h_prev at every position
      # including the chunk entry (h_0 - b_0 = a_0*h_in); b_folded would drop
      # the cross-chunk boundary term from ddt/dA.
      gah = g * (h - b)

      du_ref[0] = (dt * gB + dy * Dv).astype(du_ref.dtype)
      ddt_eff = jnp.sum(gah * A[:, :, None], axis=1) + u * gB
      ddtr_ref[0] = (ddt_eff * sig_raw).astype(ddtr_ref.dtype)
      dB_ref[0, 0] = jnp.sum(g * dtu[:, None, :], axis=0).astype(dB_ref.dtype)
      dC_ref[0, 0] = jnp.sum(h * dy[:, None, :], axis=0).astype(dC_ref.dtype)

      @pl.when(li == 0)
      def _():
          dA_ref[0] = jnp.zeros_like(dA_ref[0])
          dD_ref[0] = jnp.zeros_like(dD_ref[0])

      dA_ref[0] += jnp.sum(gah * dt[:, None, :], axis=2, keepdims=True)
      dD_ref[0] += jnp.sum(dy * u, axis=1, keepdims=True)

  return _bwd_kernel_fused


@functools.lru_cache(maxsize=None)
def _scan_core_fused(T: int, D_blk: int, G: int, interpret: bool,
                     ssd: bool = False):
    """Custom-VJP core for the fully-fused Mamba configuration (variable
    grouped B/C, delta bias + softplus, D-skip, silu(z) gate):

    core(u, dt_raw, A, Bv, Cv, bias (Dp,1), Dv (Dp,1), z) -> out (B,Dp,Lp) f32
    """

    def _fwd_call(u, dtr, A, Bv, Cv, bias, Dv, z):
        Bsz, Dp, Lp = u.shape
        N = A.shape[1]
        nS, nL = Dp // D_blk, Lp // T
        sg = nS // G
        grid = (Bsz, nS, nL)
        out, states = pl.pallas_call(
            _make_fwd_kernel_fused(_core_pair(ssd)[0]),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, l)),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, l)),
                pl.BlockSpec((D_blk, N), lambda b, s, l: (s, 0)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, l)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, l)),
                pl.BlockSpec((D_blk, 1), lambda b, s, l: (s, 0)),
                pl.BlockSpec((D_blk, 1), lambda b, s, l: (s, 0)),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, l)),
            ],
            out_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, l)),
                pl.BlockSpec((1, D_blk, N, 1), lambda b, s, l: (b * nL + l, s, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bsz, Dp, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz * nL, Dp, N, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((D_blk, N, 1), jnp.float32)],
            interpret=interpret,
        )(u, dtr, A, Bv, Cv, bias, Dv, z)
        return out, states

    def _bwd_call(u, dtr, A, Bv, Cv, bias, Dv, z, states, dout):
        Bsz, Dp, Lp = u.shape
        N = A.shape[1]
        nS, nL = Dp // D_blk, Lp // T
        sg = nS // G
        grid = (Bsz, nS, nL)
        rev = lambda l: nL - 1 - l  # noqa: E731
        du, ddtr, dA, dB, dC, dD, dz = pl.pallas_call(
            _make_bwd_kernel_fused(*_core_pair(ssd)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((D_blk, N), lambda b, s, l: (s, 0)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, rev(l))),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, rev(l))),
                pl.BlockSpec((D_blk, 1), lambda b, s, l: (s, 0)),
                pl.BlockSpec((D_blk, 1), lambda b, s, l: (s, 0)),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((1, D_blk, N, 1), lambda b, s, l: (b * nL + rev(l), s, 0, 0)),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
            ],
            out_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((1, D_blk, N, 1), lambda b, s, l: (b, s, 0, 0)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s, 0, rev(l))),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s, 0, rev(l))),
                pl.BlockSpec((1, D_blk, 1), lambda b, s, l: (b, s, 0)),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bsz, Dp, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, Dp, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, Dp, N, 1), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, nS, N, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, nS, N, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, Dp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, Dp, Lp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D_blk, N, 1), jnp.float32),
                pltpu.VMEM((D_blk, N, 1), jnp.float32),
            ],
            interpret=interpret,
        )(u, dtr, A, Bv, Cv, bias, Dv, z, states, dout)
        return du, ddtr, dA, dB, dC, dD, dz

    @jax.custom_vjp
    def core(u, dtr, A, Bv, Cv, bias, Dv, z):
        out, _ = _fwd_call(u, dtr, A, Bv, Cv, bias, Dv, z)
        return out

    def core_fwd(u, dtr, A, Bv, Cv, bias, Dv, z):
        out, states = _fwd_call(u, dtr, A, Bv, Cv, bias, Dv, z)
        return out, (u, dtr, A, Bv, Cv, bias, Dv, z, states)

    def core_bwd(res, dout):
        u, dtr, A, Bv, Cv, bias, Dv, z, states = res
        du, ddtr, dA, dB, dC, dD, dz = _bwd_call(
            u, dtr, A, Bv, Cv, bias, Dv, z, states, dout.astype(jnp.float32)
        )
        Bsz, nS, N, Lp = dB.shape
        dA = jnp.sum(dA[..., 0], axis=0)
        dB = jnp.sum(dB.reshape(Bsz, G, nS // G, N, Lp), axis=2)
        dC = jnp.sum(dC.reshape(Bsz, G, nS // G, N, Lp), axis=2)
        dbias = jnp.sum(ddtr, axis=(0, 2))[:, None]  # (Dp, 1)
        dDv = jnp.sum(dD, axis=0)  # (Dp, 1)
        return (du.astype(u.dtype), ddtr.astype(dtr.dtype), dA,
                dB.astype(Bv.dtype), dC.astype(Cv.dtype), dbias, dDv,
                dz.astype(z.dtype))

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.lru_cache(maxsize=None)
def _scan_core(T: int, D_blk: int, G: int, interpret: bool, ssd: bool = False):
    """Build the custom-VJP core scan for a given (chunk, dim-block) config.

    core(u (B,Dp,Lp), dt (B,Dp,Lp) f32, A (Dp,N), Bv (B,G,N,Lp), Cv (B,G,N,Lp))
      -> (y (B,Dp,Lp) f32, last (B,Dp,N,1) f32)
    with Dp % (G*D_blk) == 0 and Lp % T == 0 (caller pads). Channel block s
    belongs to B/C group s // (nS // G) — this is how the Mamba module fuses
    its three directional scans into one kernel launch (each direction is a
    contiguous channel group with its own B/C streams).
    """

    def _fwd_call(u, dt, A, Bv, Cv):
        Bsz, Dp, Lp = u.shape
        N = A.shape[1]
        nS, nL = Dp // D_blk, Lp // T
        sg = nS // G  # dim-blocks per group
        grid = (Bsz, nS, nL)
        y, states, last = pl.pallas_call(
            _make_fwd_kernel(_core_pair(ssd)[0]),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, l)),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, l)),
                pl.BlockSpec((D_blk, N), lambda b, s, l: (s, 0)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, l)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, l)),
            ],
            out_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, l)),
                pl.BlockSpec((1, D_blk, N, 1), lambda b, s, l: (b * nL + l, s, 0, 0)),
                pl.BlockSpec((1, D_blk, N, 1), lambda b, s, l: (b, s, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bsz, Dp, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz * nL, Dp, N, 1), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, Dp, N, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((D_blk, N, 1), jnp.float32)],
            interpret=interpret,
        )(u, dt, A, Bv, Cv)
        return y, states, last

    def _bwd_call(u, dt, A, Bv, Cv, states, dy):
        Bsz, Dp, Lp = u.shape
        N = A.shape[1]
        nS, nL = Dp // D_blk, Lp // T
        sg = nS // G
        grid = (Bsz, nS, nL)
        rev = lambda l: nL - 1 - l  # noqa: E731
        du, ddt, dA, dB, dC = pl.pallas_call(
            _make_bwd_kernel(*_core_pair(ssd)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((D_blk, N), lambda b, s, l: (s, 0)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, rev(l))),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s // sg, 0, rev(l))),
                pl.BlockSpec((1, D_blk, N, 1), lambda b, s, l: (b * nL + rev(l), s, 0, 0)),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
            ],
            out_specs=[
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((1, D_blk, T), lambda b, s, l: (b, s, rev(l))),
                pl.BlockSpec((1, D_blk, N, 1), lambda b, s, l: (b, s, 0, 0)),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s, 0, rev(l))),
                pl.BlockSpec((1, 1, N, T), lambda b, s, l: (b, s, 0, rev(l))),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bsz, Dp, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, Dp, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, Dp, N, 1), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, nS, N, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, nS, N, Lp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D_blk, N, 1), jnp.float32),
                pltpu.VMEM((D_blk, N, 1), jnp.float32),
            ],
            interpret=interpret,
        )(u, dt, A, Bv, Cv, states, dy)
        return du, ddt, dA, dB, dC

    @jax.custom_vjp
    def core(u, dt, A, Bv, Cv):
        y, _, last = _fwd_call(u, dt, A, Bv, Cv)
        return y, last

    def core_fwd(u, dt, A, Bv, Cv):
        y, states, last = _fwd_call(u, dt, A, Bv, Cv)
        return (y, last), (u, dt, A, Bv, Cv, states)

    def core_bwd(res, cts):
        u, dt, A, Bv, Cv, states = res
        dy, _ = cts  # gradient does not flow through last_state (ref parity)
        du, ddt, dA, dB, dC = _bwd_call(u, dt, A, Bv, Cv, states, dy.astype(jnp.float32))
        Bsz, nS, N, Lp = dB.shape
        dA = jnp.sum(dA[..., 0], axis=0)  # (Dp, N)
        dB = jnp.sum(dB.reshape(Bsz, G, nS // G, N, Lp), axis=2)  # (B, G, N, Lp)
        dC = jnp.sum(dC.reshape(Bsz, G, nS // G, N, Lp), axis=2)
        return du.astype(u.dtype), ddt, dA, dB.astype(Bv.dtype), dC.astype(Cv.dtype)

    core.defvjp(core_fwd, core_bwd)
    return core


def selective_scan_pallas(
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
    chunk: int = DEFAULT_CHUNK,
    interpret: Optional[bool] = None,
) -> Array | tuple[Array, Array]:
    """Selective scan on TPU via the chunked Pallas kernel.

    Requires variable (input-dependent) B and C: (batch, N, L), or grouped
    (batch, G, N, L) with dim % G == 0 — channel group g uses B/C stream g
    (the Mamba module fuses its three directional scans this way). Constant
    B/C (2-D) falls back to the associative-scan implementation.

    Numerics note for A/B-ing MMU_SSD on out-of-domain inputs: the SSD core
    used on >=32-channel tiles clips its in-16-block factored-decay exponent
    at +-123 (`ssd_core.E_CLIP`), so it deviates from the exact recurrence —
    gracefully, never NaN — once per-token dt*|A| exceeds ~10.6. The
    window-decay core (small-D tiles, or MMU_SSD=0) stays exact everywhere,
    like the reference CUDA kernel; the two paths agree bit-for-bit only
    inside the clip's domain (the reference's dt regime is ~100x inside it).
    """
    grouped_ok = (
        B.ndim == C.ndim
        and (B.ndim == 3 or (B.ndim == 4 and u.shape[1] % B.shape[1] == 0))
    )
    if not grouped_ok:
        from mm_unet_tpu.ops import selective_scan as ss

        return ss.selective_scan(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus,
            return_last_state, implementation="assoc",
        )
    if interpret is None:
        interpret = not any(d.platform == "tpu" for d in jax.devices())

    dtype_in = u.dtype
    batch, dim, L = u.shape
    if B.ndim == 3:
        B = B[:, None]
        C = C[:, None]
    G = B.shape[1]
    dg = dim // G  # channels per group
    N = A.shape[1]

    D_blk = min(32, _round_up(dg, 8))
    T = max(128, _round_up(chunk, 128))  # lane-dim blocks must be 128-aligned
    # SSD chunked-matmul core for large-D tiles (RCG shapes): ~10 VPU
    # ops/element vs the window scan's ~36, matmuls on the MXU. Small-D
    # (MMConv) tiles keep the window-decay core (grid-overhead-bound and
    # the SSD masks would dominate the tiny tiles). MMU_SSD=0 disables.
    use_ssd = (
        D_blk >= 32
        and os.environ.get("MMU_SSD", "1") != "0"
    )
    if use_ssd and T % 128 != 0:
        T = _round_up(T, 128)
    if D_blk <= 8:
        # small-channel scans (MMConv: d_inner ~= 6 per direction) are
        # grid-overhead-bound — use longer chunks so each grid step does
        # enough work to amortise the per-step cost
        T = max(T, 1024)
    dgp, Lp = _round_up(dg, D_blk), _round_up(L, T)
    pad_d, pad_l = dgp - dg, Lp - L

    def pad_grouped(x):
        # pad the channel dim per group (channels are G contiguous groups)
        x = x.reshape(batch, G, dg, x.shape[-1])
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_d), (0, pad_l)))
        return x.reshape(batch, G * dgp, -1)

    def pad_vec(v):
        v = v.astype(jnp.float32).reshape(G, dg)
        return jnp.pad(v, ((0, 0), (0, pad_d))).reshape(G * dgp, 1)

    fused = (
        z is not None and D is not None and delta_bias is not None
        and delta_softplus and not return_last_state
    )
    if fused:
        # fully-fused Mamba path: softplus prologue + D-skip/silu(z) epilogue
        # run inside the kernel (saves the surrounding XLA elementwise passes
        # and their HBM round trips)
        if pad_d or pad_l:
            u_p, dtr_p, z_p = pad_grouped(u), pad_grouped(delta), pad_grouped(z)
            A_p = jnp.pad(
                A.astype(jnp.float32).reshape(G, dg, N), ((0, 0), (0, pad_d), (0, 0))
            ).reshape(G * dgp, N)
            B_p = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
            C_p = jnp.pad(C, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        else:
            u_p, dtr_p, z_p = u, delta, z
            A_p, B_p, C_p = A.astype(jnp.float32), B, C
        bias_p = pad_vec(delta_bias)
        Dv_p = pad_vec(D)
        core = _scan_core_fused(T, D_blk, G, bool(interpret), use_ssd)
        out = core(u_p, dtr_p, A_p, B_p, C_p, bias_p, Dv_p, z_p)
        if pad_d:
            out = out.reshape(batch, G, dgp, Lp)[:, :, :dg, :L].reshape(batch, dim, L)
        else:
            out = out[:, :, :L]
        return out.astype(dtype_in)

    dt_eff = _prep_delta(delta, delta_bias, delta_softplus)
    if pad_d or pad_l:
        u_p, dt_p = pad_grouped(u), pad_grouped(dt_eff)
        A_p = jnp.pad(
            A.astype(jnp.float32).reshape(G, dg, N), ((0, 0), (0, pad_d), (0, 0))
        ).reshape(G * dgp, N)
        B_p = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        C_p = jnp.pad(C, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
    else:
        u_p, dt_p, A_p, B_p, C_p = u, dt_eff, A.astype(jnp.float32), B, C

    core = _scan_core(T, D_blk, G, bool(interpret), use_ssd)
    y, last = core(u_p, dt_p, A_p, B_p, C_p)
    if pad_d:
        y = y.reshape(batch, G, dgp, Lp)[:, :, :dg, :L].reshape(batch, dim, L)
        last = last.reshape(batch, G, dgp, N, 1)[:, :, :dg].reshape(batch, dim, N, 1)
    else:
        y = y[:, :, :L]
    out = _finalize(y, u.astype(jnp.float32), D, z, dtype_in)
    if return_last_state:
        last = jax.lax.stop_gradient(last[..., 0])
        return out, last
    return out
