"""SSD (chunked-matmul) selective-scan cores for the Pallas TPU kernels.

Replaces the Hillis-Steele window-decay scan (`pallas_scan._window_scan_fwd`
etc., ~27 VPU arith ops/element over log2(T) full-tile passes) with the
Mamba-2 "state-space dual" decomposition executed INSIDE the kernel tile:
the first-order recurrence h_t = exp2(A2*dt_t) h_{t-1} + b_t over a
(D_blk, N, T) tile becomes, per 16-token stability block,

    h = w_in * ( (b * w_out) @ TRI16  +  q * E_broadcast )

with w_in = exp2(clip(A2 * zrel)) (zrel = in-16-block cumsum of dt relative
to the block midpoint), w_out = 1/w_in, TRI16 a block-diagonal triangular
0/1 mask contracted on the MXU at lane width 128 (the T lanes are reshaped
to (T/128, 128) so the matmul FLOPs are 2*D*N*T*128 — negligible), and E
the per-16-block entry states propagated by a log-depth shift scan over the
T/16 block axis. ~10 VPU ops/element; benchmarks/ssd_proto.py measured even
the unfused XLA version of this formulation at parity with the window-decay
kernel while moving ~8x the HBM bytes.

Numerical contract: all CROSS-block factors are pure decays (exponent <= 0,
unconditionally safe, like the window-decay kernel). The only growing factor
is the in-16-block w_out = exp2(-A2*zrel) with |exponent| <= |A2| * (8-token
dt sum); the exponent is clipped to +-123, so the kernel NEVER produces
inf/NaN, and is bit-exactly unaffected by the clip whenever
|A2| * sum(dt over any 8 tokens) < 123 — i.e. per-token dt*|A| < ~10.6,
far beyond the reference's dt domain (softplus init in [1e-3, 0.1],
|A| <= d_state; `requirements/mamba_simple.py:98-117`). Beyond the clip the
result degrades gracefully (decay-monotone over-estimates, never NaN).

Four flavors cover both scan directions and their adjoints (pair decay
exp2(A2*(z_t - z_s)) with z the in-block INCLUSIVE or EXCLUSIVE cumsum):

    prefix  inclusive: h_t = a_t h_{t-1} + b_t          (forward scan)
    suffix  inclusive: g_t = a_{t+1} g_{t+1} + c_t      (adjoint of forward)
    suffix  exclusive: h_t = a_t h_{t+1} + b_t          (reversed-dir scan)
    prefix  exclusive: g_t = a_{t-1} g_{t-1} + c_t      (adjoint of reversed)

Reference semantics anchor: the same recurrence as the CUDA chunked scan at
`/root/reference/requirements/Mamba/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh:169-258`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

M_LANE = 128  # matmul lane width (one vreg row)
R_BLK = 16    # stability block: factored-decay exponent spans +-|A2|*sum8
E_CLIP = 123.0  # exp2 exponent clip: NaN-free for arbitrary inputs

def _dot(a: Array, m: Array, passes: int = 2) -> Array:
    """f32-accurate mask contraction at 2x bf16-pass cost: every mask here is
    0/1, so after splitting the operand into bf16 hi + lo halves there is NO
    multiply rounding at all (x*1 is exact in bf16) — only f32 accumulation
    error (~1e-7) remains. A single HIGHEST (6-pass f32) dot measured ~1.7x
    slower end-to-end; Mosaic does not implement Precision.HIGH.
    passes=1 drops the lo half (bf16-rounded operands, ~2^-8 relative):
    for bf16-stream kernels whose inputs carry that rounding already."""
    mb = m.astype(jnp.bfloat16)
    hi = a.astype(jnp.bfloat16)
    out = jax.lax.dot(hi, mb, preferred_element_type=jnp.float32)
    if passes == 1:
        return out
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return out + jax.lax.dot(lo, mb, preferred_element_type=jnp.float32)


def _pair_masks(T: int, exclusive: bool, suffix: bool):
    """(T, T) f32 masks: MZ (signed in-16-block midpoint-relative cumsum
    coefficients, contracted against dt) and MG (block-diag pair mask for
    the main matmul, used via the (T/128, 128) lane split)."""
    s = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    same = (s // R_BLK) == (t // R_BLK)
    le = (s < t) if exclusive else (s <= t)
    mid = (t // R_BLK) * R_BLK + R_BLK // 2 - 1
    le_mid = (s < mid) if exclusive else (s <= mid)
    MZ = (jnp.asarray(same & le, jnp.float32)
          - jnp.asarray(same & le_mid, jnp.float32))
    MGl = _lane_pair_mask(exclusive, suffix)
    return MZ, MGl


def _lane_pair_mask(exclusive: bool, suffix: bool):
    """(M_LANE, M_LANE) block-diag-16 pair mask for the lane-split matmul."""
    s = jax.lax.broadcasted_iota(jnp.int32, (M_LANE, M_LANE), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (M_LANE, M_LANE), 1)
    same = (s // R_BLK) == (t // R_BLK)
    return jnp.asarray(same & ((s >= t) if suffix else (s <= t)), jnp.float32)


def _blk_masks(T: int, exclusive: bool):
    """(T, KT) and (KT, T) block-summary masks, KT = T // R_BLK:
    ZM (z at midpoint), CS (block sum), LL (last lane), BC (broadcast)."""
    KT = T // R_BLK
    sK = jax.lax.broadcasted_iota(jnp.int32, (T, KT), 0)
    kK = jax.lax.broadcasted_iota(jnp.int32, (T, KT), 1)
    inblk = (sK // R_BLK) == kK
    off = sK - kK * R_BLK
    lim = R_BLK // 2 - 1 - (1 if exclusive else 0)
    ZM = jnp.asarray(inblk & (off <= lim), jnp.float32)
    CS = jnp.asarray(inblk, jnp.float32)
    LL = jnp.asarray(inblk & (off == R_BLK - 1), jnp.float32)
    BC = jnp.transpose(jnp.asarray(inblk, jnp.float32))
    return ZM, CS, LL, BC


def _shift_scan(a: Array, f: Array, reverse: bool):
    """Log-depth inclusive scan of the linear recurrence composition
    (a, f) along the LAST axis (length K, a power of two): returns the
    inclusive composite F_k = f_k + a_k f_{k-1} + ...  (or the mirror for
    reverse). Shifts via pad+slice (lane ops on a K-lane minor dim)."""
    K = a.shape[-1]
    s = 1
    while s < K:
        if reverse:
            a_sh = jnp.pad(a[..., s:], [(0, 0)] * (a.ndim - 1) + [(0, s)],
                           constant_values=1.0)
            f_sh = jnp.pad(f[..., s:], [(0, 0)] * (f.ndim - 1) + [(0, s)])
        else:
            a_sh = jnp.pad(a[..., :-s], [(0, 0)] * (a.ndim - 1) + [(s, 0)],
                           constant_values=1.0)
            f_sh = jnp.pad(f[..., :-s], [(0, 0)] * (f.ndim - 1) + [(s, 0)])
        f = f + a * f_sh
        a = a * a_sh
        s *= 2
    return f


def _core(dt: Array, A2: Array, b: Array, exclusive: bool, suffix: bool,
          passes: int = 2):
    """Shared implementation; see ssd_prefix/ssd_suffix."""
    D_blk, N, T = b.shape
    K = T // M_LANE
    KT = T // R_BLK
    MZ, MGl = _pair_masks(T, exclusive, suffix)
    ZM, CS, LL, BC = _blk_masks(T, exclusive)

    zrel = _dot(dt, MZ)  # (D_blk, T) in-16-block midpoint-relative cumsum
    e = jnp.clip(A2[:, :, None] * zrel[:, None, :], -E_CLIP, E_CLIP)
    w_in = jnp.exp2(e)          # (D_blk, N, T)
    w_out = 1.0 / w_in

    scaled = b * (w_in if suffix else w_out)
    # the ONLY lane-split reshape: (D_blk*N, T) -> (D_blk*N*K, 128) so the
    # pair matmul runs at lane width 128 (FLOPs 2*D*N*T*128, not *T)
    G = _dot(scaled.reshape(D_blk * N * K, M_LANE), MGl, passes).reshape(
        D_blk, N, T)
    local = (w_out if suffix else w_in) * G

    # per-16-block scalars via full-T summary matmuls (layout-clean)
    zmid = _dot(dt, ZM)  # (D_blk, KT)
    S = _dot(dt, CS)
    q = jnp.exp2(A2[:, :, None] * zmid[:, None, :])   # start->mid decay <= 1
    aS = jnp.exp2(A2[:, :, None] * S[:, None, :])     # full-block decay <= 1

    if suffix:
        # block row-sums of w_in*b in block-start basis
        rs = _dot(scaled.reshape(D_blk * N, T), CS, passes).reshape(
            D_blk, N, KT) * q
        # suffix entry states B_k = rs_{k+1} + aS_{k+1} B_{k+1}: a reversed
        # inclusive scan of (aS, rs), shifted one block to the left
        F = _shift_scan(aS, rs, reverse=True)
        Bb = jnp.concatenate([F[..., 1:], jnp.zeros_like(F[..., :1])], axis=-1)
        qb = jnp.exp2(A2[:, :, None] * (S - zmid)[:, None, :])  # mid->end <= 1
        carry = _dot((qb * Bb).reshape(D_blk * N, KT), BC).reshape(D_blk, N, T)
        return local + w_out * carry

    # prefix: block-final local states (value at last lane)
    fl = _dot(local.reshape(D_blk * N, T), LL, passes).reshape(D_blk, N, KT)
    if exclusive:
        dtlast = _dot(dt, LL)
        fl = fl * jnp.exp2(A2[:, :, None] * dtlast[:, None, :])
    # entry states E_k = fl_{k-1} + aS_{k-1} E_{k-1}: forward inclusive scan
    # of (aS, fl), shifted one block to the right
    F = _shift_scan(aS, fl, reverse=False)
    Eb = jnp.concatenate([jnp.zeros_like(F[..., :1]), F[..., :-1]], axis=-1)
    carry = _dot((q * Eb).reshape(D_blk * N, KT), BC).reshape(D_blk, N, T)
    return local + w_in * carry


def ssd_prefix(dt: Array, A2: Array, b: Array, exclusive: bool = False,
               passes: int = 2) -> Array:
    """h_t = sum_{s<=t} exp2(A2*(z_t - z_s)) b_s over the T axis.

    dt (D_blk, T) f32, A2 (D_blk, N) f32 (A*log2e, negative), b (D_blk, N, T).
    z inclusive: recurrence h_t = exp2(A2 dt_t) h_{t-1} + b_t;
    z exclusive: recurrence h_t = exp2(A2 dt_{t-1}) h_{t-1} + b_t.
    Requires T % 128 == 0.
    """
    return _core(dt, A2, b, exclusive, suffix=False, passes=passes)


def ssd_suffix(dt: Array, A2: Array, b: Array, exclusive: bool = False,
               passes: int = 2) -> Array:
    """g_t = sum_{r>=t} exp2(A2*(z_r - z_t)) b_r over the T axis.

    z inclusive: the adjoint of the forward scan (decay at the LATER index);
    z exclusive: the reversed-direction scan h_t = exp2(A2 dt_t) h_{t+1} + b_t.
    Requires T % 128 == 0.
    """
    return _core(dt, A2, b, exclusive, suffix=True, passes=passes)
