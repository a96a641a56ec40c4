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

Round-5 structure: the mask constants can be built ON THE HOST
(`make_masks`) and passed into the Pallas kernels as operands with constant
index maps — they then sit in VMEM for the kernel's whole grid instead of
being rebuilt from iota/compare chains every chunk (a (T,T) build is ~8
full passes over 262k elements per rebuild — comparable to one scan tile's
entire elementwise work). `ssd_pair` computes a prefix scan AND a suffix
scan of the same flavor while sharing every decay tile (zrel, w_in, w_out,
zmid, S, q, aS) — the backward kernel's forward-recompute + adjoint pair
uses it to halve the shared-tile arithmetic.

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

import os

import jax
import jax.numpy as jnp

Array = jax.Array

# A/B toggle (read at import): derive the prefix block-final states from
# G's last lane via closed-form w_in (saves one full-tile multiply) vs the
# original local=w_in*G materialisation. Default OFF: measured RCG2 fwd
# 38.9 -> 41.9 ms with it on — Mosaic schedules the local materialisation
# better than the "saved" multiply is worth (round 5).
_GOLF = os.environ.get("MMU_SSD_GOLF", "0") != "0"

M_LANE = 128  # matmul lane width (one vreg row)
R_BLK = 16    # stability block: factored-decay exponent spans +-|A2|*sum8
E_CLIP = 123.0  # exp2 exponent clip: NaN-free for arbitrary inputs

MASK_NAMES = ("MZ", "MGp", "MGs", "ZM", "CS", "LL", "BC")


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


def _pair_mz(T: int, exclusive: bool):
    """(T, T) signed in-16-block midpoint-relative cumsum coefficients
    (contracted against dt to give zrel). Values in {-1, 0, 1}."""
    s = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    same = (s // R_BLK) == (t // R_BLK)
    le = (s < t) if exclusive else (s <= t)
    mid = (t // R_BLK) * R_BLK + R_BLK // 2 - 1
    le_mid = (s < mid) if exclusive else (s <= mid)
    return (jnp.asarray(same & le, jnp.float32)
            - jnp.asarray(same & le_mid, jnp.float32))


def _lane_pair_mask(suffix: bool):
    """(M_LANE, M_LANE) block-diag-16 pair mask for the lane-split matmul.
    Independent of the inclusive/exclusive flavor (the diagonal term's decay
    is 1 in both; exclusivity enters through MZ's cumsum choice)."""
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


def make_masks(T: int, exclusive: bool, dtype=jnp.bfloat16) -> dict:
    """Host-side mask constants for the SSD cores, in `MASK_NAMES` order.

    Built OUTSIDE the kernel and passed as pallas_call operands with
    constant index maps, so they're DMA'd into VMEM once and reused across
    every grid step and channel sub-block — instead of being re-derived
    from iota chains inside the kernel each chunk. bf16 storage is exact:
    every value is in {-1, 0, 1} and `_dot` casts masks to bf16 anyway.
    """
    ZM, CS, LL, BC = _blk_masks(T, exclusive)
    masks = {
        "MZ": _pair_mz(T, exclusive),
        "MGp": _lane_pair_mask(suffix=False),
        "MGs": _lane_pair_mask(suffix=True),
        "ZM": ZM, "CS": CS, "LL": LL, "BC": BC,
    }
    return {k: v.astype(dtype) for k, v in masks.items()}


def _shift_scan(a: Array, f: Array, reverse: bool):
    """Log-depth inclusive scan of the linear recurrence composition
    (a, f) along the LAST axis: returns the inclusive composite
    F_k = f_k + a_k f_{k-1} + ...  (or the mirror for reverse). Correct for
    ANY length K — the Hillis-Steele doubling loop's reach after its last
    step is >= K-1 (callers pass KT = T/16, which is only guaranteed a
    multiple of 8). Shifts via pad+slice (lane ops on a K-lane minor dim)."""
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


class _Shared:
    """Decay tiles shared between a prefix and a suffix scan of the same
    inclusive/exclusive flavor (and across both when paired). A plain
    trace-time container — every field is a traced array or static flag."""

    def __init__(self, dt: Array, A2: Array, exclusive: bool, passes: int,
                 masks: dict | None):
        if masks is None:
            ZM, CS, LL, BC = _blk_masks(dt.shape[-1], exclusive)
            masks = {
                "MZ": _pair_mz(dt.shape[-1], exclusive),
                "MGp": _lane_pair_mask(suffix=False),
                "MGs": _lane_pair_mask(suffix=True),
                "ZM": ZM, "CS": CS, "LL": LL, "BC": BC,
            }
        self.masks = masks
        self.exclusive = exclusive
        self.passes = passes
        zrel = _dot(dt, masks["MZ"])  # (D_blk, T) in-block midpoint-rel cumsum
        e = jnp.clip(A2[:, :, None] * zrel[:, None, :], -E_CLIP, E_CLIP)
        self.w_in = jnp.exp2(e)          # (D_blk, N, T)
        self.w_out = 1.0 / self.w_in
        # per-16-block scalars via full-T summary matmuls (layout-clean)
        self.zmid = _dot(dt, masks["ZM"])  # (D_blk, KT)
        self.S = _dot(dt, masks["CS"])
        self.q = jnp.exp2(A2[:, :, None] * self.zmid[:, None, :])  # start->mid
        self.aS = jnp.exp2(A2[:, :, None] * self.S[:, None, :])    # full block
        self.dtlast = _dot(dt, masks["LL"]) if exclusive else None
        self.A2 = A2


def _prefix_part(sh: _Shared, b: Array) -> Array:
    """h_t = sum_{s<=t} exp2(A2*(z_t - z_s)) b_s given shared decay tiles."""
    D_blk, N, T = b.shape
    K = T // M_LANE
    scaled = b * sh.w_out
    G = _dot(scaled.reshape(D_blk * N * K, M_LANE), sh.masks["MGp"],
             sh.passes).reshape(D_blk, N, T)
    if _GOLF:
        # block-final local states WITHOUT materialising local = w_in*G:
        # extraction at the block-last lane is pointwise, so
        # (w_in*G)_last = G_last * w_in_last, and w_in at the block end has
        # the closed form exp2(clip(A2 * zrel_last)) with
        #   zrel_last = S - zmid            (inclusive cumsum)
        #   zrel_last = S - dtlast - zmid   (exclusive cumsum)
        Gl = _dot(G.reshape(D_blk * N, T), sh.masks["LL"], sh.passes).reshape(
            D_blk, N, T // R_BLK)
        zlast = sh.S - sh.zmid
        if sh.exclusive:
            zlast = zlast - sh.dtlast
        wlast = jnp.exp2(jnp.clip(sh.A2[:, :, None] * zlast[:, None, :],
                                  -E_CLIP, E_CLIP))
        fl = Gl * wlast
        local = None
    else:
        local = sh.w_in * G
        fl = _dot(local.reshape(D_blk * N, T), sh.masks["LL"],
                  sh.passes).reshape(D_blk, N, T // R_BLK)
    if sh.exclusive:
        # exclusive recurrence: the next block's entry also decays through
        # the last token's own dt
        fl = fl * jnp.exp2(sh.A2[:, :, None] * sh.dtlast[:, None, :])
    # entry states E_k = fl_{k-1} + aS_{k-1} E_{k-1}: forward inclusive scan
    # of (aS, fl), shifted one block to the right
    F = _shift_scan(sh.aS, fl, reverse=False)
    Eb = jnp.concatenate([jnp.zeros_like(F[..., :1]), F[..., :-1]], axis=-1)
    carry = _dot((sh.q * Eb).reshape(D_blk * N, T // R_BLK),
                 sh.masks["BC"]).reshape(D_blk, N, T)
    if _GOLF:
        return sh.w_in * (G + carry)
    return local + sh.w_in * carry


def _suffix_part(sh: _Shared, b: Array) -> Array:
    """g_t = sum_{r>=t} exp2(A2*(z_r - z_t)) b_r given shared decay tiles."""
    D_blk, N, T = b.shape
    K = T // M_LANE
    KT = T // R_BLK
    scaled = b * sh.w_in
    G = _dot(scaled.reshape(D_blk * N * K, M_LANE), sh.masks["MGs"],
             sh.passes).reshape(D_blk, N, T)
    # block row-sums of w_in*b in block-start basis
    rs = _dot(scaled.reshape(D_blk * N, T), sh.masks["CS"], sh.passes).reshape(
        D_blk, N, KT) * sh.q
    # suffix entry states B_k = rs_{k+1} + aS_{k+1} B_{k+1}: a reversed
    # inclusive scan of (aS, rs), shifted one block to the left
    F = _shift_scan(sh.aS, rs, reverse=True)
    Bb = jnp.concatenate([F[..., 1:], jnp.zeros_like(F[..., :1])], axis=-1)
    qb = jnp.exp2(sh.A2[:, :, None] * (sh.S - sh.zmid)[:, None, :])  # mid->end
    carry = _dot((qb * Bb).reshape(D_blk * N, KT),
                 sh.masks["BC"]).reshape(D_blk, N, T)
    if _GOLF:
        return sh.w_out * (G + carry)
    return sh.w_out * G + sh.w_out * carry


def ssd_prefix(dt: Array, A2: Array, b: Array, exclusive: bool = False,
               passes: int = 2, masks: dict | None = None) -> Array:
    """h_t = sum_{s<=t} exp2(A2*(z_t - z_s)) b_s over the T axis.

    dt (D_blk, T) f32, A2 (D_blk, N) f32 (A*log2e, negative), b (D_blk, N, T).
    z inclusive: recurrence h_t = exp2(A2 dt_t) h_{t-1} + b_t;
    z exclusive: recurrence h_t = exp2(A2 dt_{t-1}) h_{t-1} + b_t.
    Requires T % 128 == 0. `masks` from `make_masks(T, exclusive)` skips the
    in-kernel mask rebuild (pass them as pallas operands).
    """
    return _prefix_part(_Shared(dt, A2, exclusive, passes, masks), b)


def ssd_suffix(dt: Array, A2: Array, b: Array, exclusive: bool = False,
               passes: int = 2, masks: dict | None = None) -> Array:
    """g_t = sum_{r>=t} exp2(A2*(z_r - z_t)) b_r over the T axis.

    z inclusive: the adjoint of the forward scan (decay at the LATER index);
    z exclusive: the reversed-direction scan h_t = exp2(A2 dt_t) h_{t+1} + b_t.
    Requires T % 128 == 0.
    """
    return _suffix_part(_Shared(dt, A2, exclusive, passes, masks), b)


def ssd_pair(dt: Array, A2: Array, b_prefix: Array, b_suffix: Array,
             exclusive: bool = False, passes: int = 2,
             masks: dict | None = None) -> tuple[Array, Array]:
    """(prefix scan of b_prefix, suffix scan of b_suffix) sharing every
    decay tile. The backward kernel's forward-recompute and adjoint scans
    always use the SAME inclusive/exclusive flavor (forward dir: prefix
    inclusive + suffix inclusive; reversed dir: suffix exclusive + prefix
    exclusive), so zrel, the (D,N,T) exp2/reciprocal w tiles and the block
    summaries are computed once instead of twice."""
    sh = _Shared(dt, A2, exclusive, passes, masks)
    return _prefix_part(sh, b_prefix), _suffix_part(sh, b_suffix)
