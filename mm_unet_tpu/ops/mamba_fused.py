"""Fused Mamba-inner Pallas kernel: projections + selective scan + gate in one
kernel, with in-kernel reversed-direction scanning.

TPU-native analogue of the reference's fused `mamba_inner_fn_no_out_proj`
(`/root/reference/requirements/Mamba/mamba/mamba_ssm/ops/selective_scan_interface.py:155-225`),
which chains causal-conv1d -> x_proj -> dt_proj -> selective_scan -> silu(z)
gate while rematerialising the projections in backward. Here the causal
depthwise conv + SiLU run as shifted multiply-adds and the x_proj/dt_proj
matmuls run on the MXU — all *inside* the scan kernel, one (d_inner, T)
chunk at a time, so the conv output, the (B, G, R+2N, L) `x_dbl`, the
(B, G*D, L) `dt` and the (B, G, N, L) B/C streams are never materialised in
HBM — they exist one VMEM tile at a time. The conv's cross-chunk halo comes
from a second BlockSpec view of x mapping to the neighbour chunk; the conv
backward's cross-chunk term is carried in VMEM scratch by the adjoint grid.
This removes the standalone conv kernels and the layout copies XLA inserted
between the einsums and the scan custom-call, and their HBM round trips.

The backward-direction scan of bi-/tri-directional Mamba runs RIGHT-TO-LEFT
inside the kernel (suffix scan + reversed grid order) instead of flipping the
operand streams — `jnp.flip` of (B, 2D, L) tensors and their un-flips
disappear entirely.

Scan algorithm: chunked window-decay scan (see `pallas_scan.py`): window
products prod a_q = exp2(A * window_sum(delta)) with window sums built by
progressive doubling on 2-D (channels, T) tiles, so only the b-stream rolls
full-size.

Numerics match the un-fused path: streams in bf16 (MXU native), scan state
and reductions in f32.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm_unet_tpu.ops.ssd_core import (MASK_NAMES, make_masks, ssd_pair,
                                      ssd_prefix, ssd_suffix)

Array = jax.Array

_LOG2E = 1.4426950408889634
_BIG = 1e30  # masked window sum -> exp2(A*_BIG) == 0 for A < 0

# A/B toggle (read at import): pass the SSD masks as VMEM-resident kernel
# operands (1) or rebuild them from iota chains inside the kernel (0).
# Round-5 measurement: hoisting REGRESSED RCG2 fwd 38.9 -> 42.5 ms — Mosaic
# constant-folds the in-kernel masks, so operands only add load overhead.
_HOIST = os.environ.get("MMU_SSD_HOIST", "0") != "0"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# window-decay scans on a (SB, N, T) sub-block; dt is 2-D (SB, T)
# ---------------------------------------------------------------------------

def _wscan_fwd(dt, A2, b):
    """h_t = a_t h_{t-1} + b_t (prefix): windows ws_s[t] = sum_{t-s+1..t} dt."""
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


def _wscan_rev(dt, A2, b):
    """h_t = a_t h_{t+1} + b_t (suffix): windows us_s[t] = sum_{t..t+s-1} dt."""
    T = b.shape[2]
    col2 = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    us = dt
    s = 1
    while s < T:
        wm = jnp.where(col2 < T - s, us, _BIG)
        b = jnp.exp2(wm[:, None, :] * A2[:, :, None]) * pltpu.roll(b, T - s, axis=2) + b
        if s * 2 < T:
            us = us + pltpu.roll(us, T - s, axis=1)
        s *= 2
    return b


def _wscan_adj_of_fwd(dt, A2, g):
    """g_t = a_{t+1} g_{t+1} + ginit_t: suffix windows vs_s[t] = sum_{t+1..t+s} dt."""
    T = g.shape[2]
    col2 = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    vs = pltpu.roll(dt, T - 1, axis=1)  # dt[t+1]
    s = 1
    while s < T:
        wm = jnp.where(col2 < T - s, vs, _BIG)
        g = g + jnp.exp2(wm[:, None, :] * A2[:, :, None]) * pltpu.roll(g, T - s, axis=2)
        if s * 2 < T:
            vs = vs + pltpu.roll(vs, T - s, axis=1)
        s *= 2
    return g


def _wscan_adj_of_rev(dt, A2, g):
    """g_t = a_{t-1} g_{t-1} + ginit_t: lagged prefix windows
    ps_s[t] = sum_{t-s..t-1} dt."""
    T = g.shape[2]
    col2 = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    ps = pltpu.roll(dt, 1, axis=1)  # dt[t-1]
    s = 1
    while s < T:
        wm = jnp.where(col2 >= s, ps, _BIG)
        g = g + jnp.exp2(wm[:, None, :] * A2[:, :, None]) * pltpu.roll(g, s, axis=2)
        if s * 2 < T:
            ps = ps + pltpu.roll(ps, s, axis=1)
        s *= 2
    return g


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _shift_with_halo(cur, halo, k, halo_ok, anticausal):
    """Value stream cur[t -+ k] on a (Dp, T) tile, out-of-chunk positions
    filled from `halo` (the neighbour chunk in shift direction) or zero when
    `halo_ok` is false (sequence boundary == the conv's zero padding)."""
    T = cur.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
    if anticausal:  # cur[t + k]; positions t >= T-k come from the next chunk
        return jnp.where(
            col < T - k,
            pltpu.roll(cur, T - k, axis=1),
            jnp.where(halo_ok, pltpu.roll(halo, T - k, axis=1), 0.0),
        )
    # cur[t - k]; positions t < k come from the previous chunk
    return jnp.where(
        col >= k,
        pltpu.roll(cur, k, axis=1),
        jnp.where(halo_ok, pltpu.roll(halo, k, axis=1), 0.0),
    )


def _conv_streams(x_ref, xh_ref, cw_ref, lp, halo_ok, reverse, W, L, T):
    """In-kernel causal depthwise conv + SiLU on one (Dp, T) chunk.

    The reference fuses causal_conv1d into `mamba_inner_fn_no_out_proj`
    (`selective_scan_interface.py:177`); here the W-tap conv is W shifted
    multiply-adds on the 2-D (Dp, T) tile, with the cross-chunk halo read
    from a SECOND BlockSpec view of x that maps to the neighbour chunk in
    conv direction (previous token chunk for causal, next for anti-causal).
    `halo_ok` is false on the sequence-boundary chunk -> zero halo, matching
    the conv's zero padding. `lp` is the chunk's physical (token-order) index.

    x_ref/xh_ref are (1, 1, 1, Dp, T) blocks of the packed xz array (the
    x half selected by the BlockSpec index map).

    Returns (xc32 f32 conv+silu masked to the real L tokens, pre-activation,
             valid-token mask, the W-1 shifted x streams, x32).
    """
    x32 = x_ref[0, 0, 0].astype(jnp.float32)
    xh32 = xh_ref[0, 0, 0].astype(jnp.float32)
    pre = x32 * cw_ref[0, :, W - 1 : W]
    shifted = []
    for k in range(1, W):
        s = _shift_with_halo(x32, xh32, k, halo_ok, anticausal=reverse)
        shifted.append(s)
        pre = pre + s * cw_ref[0, :, W - 1 - k : W - k]
    pre = pre + cw_ref[0, :, W : W + 1]  # bias tap
    # zero the L..Lp padded tail: the scan state and the conv-weight grads
    # must see u == 0 there (the old XLA conv ran on unpadded L, then padded)
    col = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
    valid = lp * T + col < L
    xc32 = jnp.where(valid, jax.nn.silu(pre), 0.0)
    return xc32, pre, valid, shifted, x32


def _proj_tiles(u_b, xp_ref, dtw_ref, dtb_ref, N):
    """In-kernel projections: x_dbl via MXU, then dt rows -> (dt_raw, B, C).

    u_b: (Dp, T) bf16. xp_ref block (1, rBp+2N, Dp); dtw (1, Dp, rBp);
    row layout of the padded x_proj: [0:rBp) dt-rank rows, [rBp:rBp+N) B,
    [rBp+N:rBp+2N) C — all 8-aligned so the slices are sublane-slices.
    """
    rBp = xp_ref.shape[1] - 2 * N
    xdbl = jnp.dot(xp_ref[0], u_b, preferred_element_type=jnp.float32)  # (rBp+2N, T)
    dtr = jnp.dot(
        dtw_ref[0], xdbl[:rBp].astype(u_b.dtype), preferred_element_type=jnp.float32
    )  # (Dp, T)
    dtr = dtr + dtb_ref[0]
    Bv = xdbl[rBp : rBp + N]
    Cv = xdbl[rBp + N :]
    return xdbl, dtr, Bv, Cv


def _scan_dir(dt, A2, b, reverse: bool, ssd: bool, passes: int, masks=None):
    """Direction scan: SSD chunked-matmul core (ops/ssd_core.py, large-D
    tiles) or the window-decay pair. reverse=True is the right-to-left scan
    h_t = a_t h_{t+1} + b_t (ssd_suffix exclusive flavor). `masks` are the
    hoisted `make_masks(T, exclusive=reverse)` kernel operands."""
    if ssd:
        return (ssd_suffix(dt, A2, b, exclusive=True, passes=passes, masks=masks)
                if reverse else ssd_prefix(dt, A2, b, passes=passes, masks=masks))
    return _wscan_rev(dt, A2, b) if reverse else _wscan_fwd(dt, A2, b)


def _scan_dir_adj_pair(dt, A2, b, ginit, reverse: bool, ssd: bool,
                       passes: int, masks=None):
    """(recomputed forward h, adjoint g) for the backward kernel. On the SSD
    path the two scans share every decay tile (`ssd_core.ssd_pair` — the
    dir scan and its adjoint always use the same inclusive/exclusive
    flavor); the window-decay path runs its two scans separately (the r3
    interleaved-backward experiment measured shared-roll fusion as a loss
    there — see STATUS.md)."""
    if ssd:
        if os.environ.get("MMU_SSD_PAIR", "1") == "0":  # A/B: separate scans
            return (_scan_dir(dt, A2, b, reverse, ssd, passes, masks),
                    ssd_prefix(dt, A2, ginit, exclusive=True, passes=passes,
                               masks=masks) if reverse
                    else ssd_suffix(dt, A2, ginit, passes=passes, masks=masks))
        if reverse:
            g, h = ssd_pair(dt, A2, ginit, b, exclusive=True, passes=passes,
                            masks=masks)
        else:
            h, g = ssd_pair(dt, A2, b, ginit, exclusive=False, passes=passes,
                            masks=masks)
        return h, g
    if reverse:
        return (_wscan_rev(dt, A2, b), _wscan_adj_of_rev(dt, A2, ginit))
    return (_wscan_fwd(dt, A2, b), _wscan_adj_of_fwd(dt, A2, ginit))


def _mega_fwd_kernel(
    x_ref, xh_ref, z_ref, cw_ref, xp_ref, dtw_ref, dtb_ref, A_ref, Dv_ref,
    *rest, reverse: bool, SB: int, N: int,
    W: int, L: int, T: int, ssd: bool = False,
):
    if ssd and _HOIST:  # 7 mask operands precede the outputs (MASK_NAMES)
        mask_refs, (out_ref, st_ref, h_ref) = rest[:7], rest[7:]
        masks = {k: r[...] for k, r in zip(MASK_NAMES, mask_refs)}
    else:
        (out_ref, st_ref, h_ref), masks = rest, None
    li = pl.program_id(2)
    nL = pl.num_programs(2)

    @pl.when(li == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    st_ref[0, 0, 0] = h_ref[..., 0]  # chunk-entry state (Dp, N)

    lp = (nL - 1 - li) if reverse else li
    xc32, _, _, _, _ = _conv_streams(
        x_ref, xh_ref, cw_ref, lp, li != 0, reverse, W, L, T
    )
    u_b = xc32.astype(x_ref.dtype)  # match the old bf16 conv-output rounding
    u = u_b.astype(jnp.float32)
    _, dtr, Bv, Cv = _proj_tiles(u_b, xp_ref, dtw_ref, dtb_ref, N)
    dt = jax.nn.softplus(dtr)
    A2 = A_ref[0].astype(jnp.float32) * _LOG2E  # (Dp, N)
    z = z_ref[0, 0, 0].astype(jnp.float32)
    Dv = Dv_ref[0]

    Dp, T = u.shape
    edge = T - 1 if reverse else 0
    for i in range(Dp // SB):
        sl = slice(i * SB, (i + 1) * SB)
        dti, ui, A2i = dt[sl], u[sl], A2[sl]
        b = (dti * ui)[:, None, :] * Bv[None]  # (SB, N, T) f32
        a_e = jnp.exp2(dti[:, edge : edge + 1][:, None, :] * A2i[:, :, None])
        col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
        b = b + jnp.where(col == edge, a_e * h_ref[sl], 0.0)
        passes = 1 if x_ref.dtype == jnp.bfloat16 else 2
        h = _scan_dir(dti, A2i, b, reverse, ssd, passes, masks)
        h_ref[sl] = h[:, :, :1] if reverse else h[:, :, -1:]
        y = jnp.sum(h * Cv[None], axis=1) + Dv[sl] * ui
        zi = z[sl]
        out_ref[0, 0, sl, :] = (y * (zi * jax.nn.sigmoid(zi))).astype(out_ref.dtype)


def _mega_bwd_kernel(
    x_ref, xh_ref, z_ref, cw_ref, xp_ref, dtw_ref, dtb_ref, A_ref, Dv_ref,
    st_ref, dout_ref,
    *rest, reverse: bool, SB: int, N: int,
    W: int, L: int, T: int, ssd: bool = False,
):
    if ssd and _HOIST:  # 7 mask operands precede the outputs (MASK_NAMES)
        mask_refs, rest = rest[:7], rest[7:]
        masks = {k: r[...] for k, r in zip(MASK_NAMES, mask_refs)}
    else:
        masks = None
    (dxz_ref, dcw_ref, dxp_ref, ddtw_ref, ddtb_ref, dA_ref, dD_ref,
     g_ref, af_ref, dpre_ref) = rest
    li = pl.program_id(2)
    nL = pl.num_programs(2)

    @pl.when(li == 0)
    def _():
        g_ref[...] = jnp.zeros_like(g_ref)
        af_ref[...] = jnp.zeros_like(af_ref)
        dpre_ref[...] = jnp.zeros_like(dpre_ref)
        dcw_ref[0, 0] = jnp.zeros_like(dcw_ref[0, 0])
        dxp_ref[0, 0] = jnp.zeros_like(dxp_ref[0, 0])
        ddtw_ref[0, 0] = jnp.zeros_like(ddtw_ref[0, 0])
        ddtb_ref[0, 0] = jnp.zeros_like(ddtb_ref[0, 0])
        dA_ref[0, 0] = jnp.zeros_like(dA_ref[0, 0])
        dD_ref[0, 0] = jnp.zeros_like(dD_ref[0, 0])

    # recompute the in-kernel conv (adjoint grid runs opposite to data flow:
    # the physical chunk is mirrored and the conv halo's boundary chunk is
    # the LAST processed one)
    lp = li if reverse else (nL - 1 - li)
    xc32, pre, valid, shifted, x32 = _conv_streams(
        x_ref, xh_ref, cw_ref, lp, li != nL - 1, reverse, W, L, T
    )
    u_b = xc32.astype(x_ref.dtype)
    u = u_b.astype(jnp.float32)
    xdbl, dtr, Bv, Cv = _proj_tiles(u_b, xp_ref, dtw_ref, dtb_ref, N)
    sig = jax.nn.sigmoid(dtr)
    dt = jax.nn.softplus(dtr)
    A = A_ref[0].astype(jnp.float32)
    A2 = A * _LOG2E
    z = z_ref[0, 0, 0].astype(jnp.float32)
    Dv = Dv_ref[0]
    dout = dout_ref[0, 0].astype(jnp.float32)
    h_in = st_ref[0, 0, 0]  # (Dp, N)

    Dp, T = u.shape
    rBp = xp_ref.shape[1] - 2 * N
    edge = T - 1 if reverse else 0
    # adjoint boundary sits at the opposite edge from the data-flow entry
    gedge = 0 if reverse else T - 1

    du_l, ddtr_l, dz_l, dA_l, dD_l = [], [], [], [], []
    dB_t = jnp.zeros((N, T), jnp.float32)
    dC_t = jnp.zeros((N, T), jnp.float32)

    for i in range(Dp // SB):
        sl = slice(i * SB, (i + 1) * SB)
        dti, ui, A2i = dt[sl], u[sl], A2[sl]
        dtu = dti * ui
        b = dtu[:, None, :] * Bv[None]
        a_e = jnp.exp2(dti[:, edge : edge + 1][:, None, :] * A2i[:, :, None])
        col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
        b_folded = b + jnp.where(col == edge, a_e * h_in[sl][:, :, None], 0.0)
        passes = 1 if x_ref.dtype == jnp.bfloat16 else 2

        zi = z[sl]
        sz = jax.nn.sigmoid(zi)
        silu = zi * sz
        doi = dout[sl]
        dy = doi * silu  # independent of h -> the adjoint seed can pair with
        # the forward recompute in ONE shared-decay-tile SSD pass
        ginit = dy[:, None, :] * Cv[None] + jnp.where(
            col == gedge, af_ref[sl] * g_ref[sl], 0.0
        )
        h, g = _scan_dir_adj_pair(dti, A2i, b_folded, ginit, reverse, ssd,
                                  passes, masks)
        y_pre = jnp.sum(h * Cv[None], axis=1) + Dv[sl] * ui
        dz_l.append(doi * y_pre * (sz + silu * (1.0 - sz)))
        g_ref[sl] = g[:, :, -1:] if reverse else g[:, :, :1]
        af_ref[sl] = a_e

        gB = jnp.sum(g * Bv[None], axis=1)  # (SB, T)
        # g * a * h_neighbour via the PRE-fold b: h - b == a*h_neighbour at
        # every position including the entry edge (h_e - b_e = a_e*h_in);
        # b_folded would zero that boundary term and drop the cross-chunk
        # ddt/dA/projection gradients.
        gah = g * (h - b)
        du_l.append(dti * gB + dy * Dv[sl])
        ddt_eff = jnp.sum(gah * A[sl][:, :, None], axis=1) + ui * gB
        ddtr_l.append(ddt_eff * sig[sl])
        dB_t = dB_t + jnp.sum(g * dtu[:, None, :], axis=0)
        dC_t = dC_t + jnp.sum(h * dy[:, None, :], axis=0)
        dA_l.append(jnp.sum(gah * dti[:, None, :], axis=2))
        dD_l.append(jnp.sum(dy * ui, axis=1, keepdims=True))

    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
    du, ddtr, dz_all = cat(du_l), cat(ddtr_l), cat(dz_l)
    dA_p, dD_p = cat(dA_l), cat(dD_l)

    # assemble dx_dbl and push through the in-kernel projections
    bdt = u_b.dtype
    ddtr_b = ddtr.astype(bdt)
    dxdbl_dt = jax.lax.dot_general(  # dtw^T @ ddtr -> (rBp, T)
        dtw_ref[0], ddtr_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxdbl = jnp.concatenate([dxdbl_dt, dB_t, dC_t], axis=0).astype(bdt)  # (rBp+2N, T)
    dxc = jax.lax.dot_general(  # xp^T @ dxdbl -> (Dp, T), grad wrt conv output
        xp_ref[0], dxdbl, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + du

    # conv backward: through silu, then transposed taps. The cross-chunk
    # term needs dpre of the neighbour chunk OPPOSITE to the conv direction,
    # which the adjoint grid processed one step earlier -> scratch carry.
    sp = jax.nn.sigmoid(pre)
    dpre = jnp.where(valid, dxc * (sp * (1.0 + pre * (1.0 - sp))), 0.0)
    dpc = dpre_ref[...]
    dxr = dpre * cw_ref[0, :, W - 1 : W]
    for k in range(1, W):
        sd = _shift_with_halo(dpre, dpc, k, li != 0, anticausal=not reverse)
        dxr = dxr + sd * cw_ref[0, :, W - 1 - k : W - k]
    dpre_ref[...] = dpre
    dxz_ref[0, 0, 0] = dxr.astype(dxz_ref.dtype)
    dxz_ref[0, 0, 1] = dz_all.astype(dxz_ref.dtype)

    # conv weight/bias grads: tap j multiplies x[t -+ (W-1-j)]
    cols = [
        jnp.sum(dpre * shifted[W - 2 - j], axis=1, keepdims=True)
        for j in range(W - 1)
    ]
    cols.append(jnp.sum(dpre * x32, axis=1, keepdims=True))  # current-tap
    cols.append(jnp.sum(dpre, axis=1, keepdims=True))  # bias
    pad = dcw_ref.shape[-1] - (W + 1)
    if pad:
        cols.append(jnp.zeros((x32.shape[0], pad), jnp.float32))
    dcw_ref[0, 0] += jnp.concatenate(cols, axis=1)

    dxp_ref[0, 0] += jax.lax.dot_general(  # dxdbl @ u^T -> (rBp+2N, Dp)
        dxdbl, u_b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ddtw_ref[0, 0] += jax.lax.dot_general(  # ddtr @ xdbl[:rBp]^T -> (Dp, rBp)
        ddtr_b, xdbl[:rBp].astype(bdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ddtb_ref[0, 0] += jnp.sum(ddtr, axis=1, keepdims=True)
    dA_ref[0, 0] += dA_p
    dD_ref[0, 0] += dD_p


# ---------------------------------------------------------------------------
# host wrapper with custom VJP
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _mega_core(T: int, Dp: int, SBf: int, SBb: int, N: int, rBp: int,
               W: int, L: int, reverse: bool, interpret: bool,
               ssd: tuple = (False, False)):
    """core(xz (B,G,2,Dp,Lp) packed raw pre-conv + gate streams,
    cwb (G,Dp,8) conv taps+bias, xp (G,rBp+2N,Dp), dtw (G,Dp,rBp),
    dtb (G,Dp,1), A (G,Dp,N), Dv (G,Dp,1)) -> out (B,G,Dp,Lp) in the stream
    dtype. x and z ride ONE packed operand (the in_proj output layout): the
    kernel selects each half by BlockSpec index map, so the host never
    materialises separate x/z copies, and the backward emits one packed dxz."""

    ssd_f, ssd_b = ssd  # forward-kernel / backward-kernel core choice
    kf = functools.partial(_mega_fwd_kernel, reverse=reverse, SB=SBf, N=N,
                           W=W, L=L, T=T, ssd=ssd_f)
    kb = functools.partial(_mega_bwd_kernel, reverse=reverse, SB=SBb, N=N,
                           W=W, L=L, T=T, ssd=ssd_b)

    def _mask_operands(ssd):
        """Hoisted SSD mask constants (XLA folds the iota chains into
        literals at compile time) + their constant-index BlockSpecs: the
        masks are DMA'd to VMEM once and stay resident across the whole
        chunk grid instead of being rebuilt in-kernel every chunk. The dir
        scan's flavor is exclusive=reverse; the adjoint shares it."""
        if not (ssd and _HOIST):
            return [], []
        masks = make_masks(T, exclusive=reverse)
        ops = [masks[k] for k in MASK_NAMES]
        specs = [
            pl.BlockSpec(m.shape, (lambda *_: (0, 0)))
            for m in ops
        ]
        return ops, specs

    def _fwd_call(xz, cwb, xp, dtw, dtb, A, Dv):
        Bsz, G, _, _, Lp = xz.shape
        nL = Lp // T
        grid = (Bsz, G, nL)
        # physical chunk for processing step l (reversed group scans R->L)
        lp = (lambda l: nL - 1 - l) if reverse else (lambda l: l)
        # conv-halo neighbour in conv direction (prev token chunk for causal,
        # next for anti-causal); the boundary chunk's halo is masked in-kernel
        if reverse:
            hf = lambda b, g, l: (b, g, 0, 0, jnp.minimum(nL - l, nL - 1))
        else:
            hf = lambda b, g, l: (b, g, 0, 0, jnp.maximum(l - 1, 0))
        mask_ops, mask_specs = _mask_operands(ssd_f)
        out, st = pl.pallas_call(
            kf,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, Dp, T), lambda b, g, l: (b, g, 0, 0, lp(l))),
                pl.BlockSpec((1, 1, 1, Dp, T), hf),
                pl.BlockSpec((1, 1, 1, Dp, T), lambda b, g, l: (b, g, 1, 0, lp(l))),
                pl.BlockSpec((1, Dp, 8), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, rBp + 2 * N, Dp), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, rBp), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, 1), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, N), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, 1), lambda b, g, l: (g, 0, 0)),
                *mask_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, Dp, T), lambda b, g, l: (b, g, 0, lp(l))),
                pl.BlockSpec((1, 1, 1, Dp, N), lambda b, g, l: (b, g, lp(l), 0, 0)),
            ],
            out_shape=[
                # gated output in the stream dtype: scan state/reductions stay
                # f32 in-kernel; emitting bf16 halves the output HBM traffic
                # and keeps the downstream direction-sum + out_proj einsum on
                # the MXU's native dtype (f32 out forced an f32 einsum)
                jax.ShapeDtypeStruct((Bsz, G, Dp, Lp), xz.dtype),
                jax.ShapeDtypeStruct((Bsz, G, nL, Dp, N), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((Dp, N, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(xz, xz, xz, cwb, xp, dtw, dtb, A, Dv, *mask_ops)
        return out, st

    def _bwd_call(xz, cwb, xp, dtw, dtb, A, Dv, st, dout):
        Bsz, G, _, _, Lp = xz.shape
        nL = Lp // T
        grid = (Bsz, G, nL)
        # adjoint runs opposite to the data flow
        lp = (lambda l: l) if reverse else (lambda l: nL - 1 - l)
        # conv halo for the recompute: same token-direction neighbour as fwd,
        # expressed in the adjoint's processing order
        if reverse:
            hf = lambda b, g, l: (b, g, 0, 0, jnp.minimum(l + 1, nL - 1))
        else:
            hf = lambda b, g, l: (b, g, 0, 0, jnp.maximum(nL - 2 - l, 0))
        mask_ops, mask_specs = _mask_operands(ssd_b)
        outs = pl.pallas_call(
            kb,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, Dp, T), lambda b, g, l: (b, g, 0, 0, lp(l))),
                pl.BlockSpec((1, 1, 1, Dp, T), hf),
                pl.BlockSpec((1, 1, 1, Dp, T), lambda b, g, l: (b, g, 1, 0, lp(l))),
                pl.BlockSpec((1, Dp, 8), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, rBp + 2 * N, Dp), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, rBp), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, 1), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, N), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, Dp, 1), lambda b, g, l: (g, 0, 0)),
                pl.BlockSpec((1, 1, 1, Dp, N), lambda b, g, l: (b, g, lp(l), 0, 0)),
                pl.BlockSpec((1, 1, Dp, T), lambda b, g, l: (b, g, 0, lp(l))),
                *mask_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 2, Dp, T), lambda b, g, l: (b, g, 0, 0, lp(l))),
                pl.BlockSpec((1, 1, Dp, 8), lambda b, g, l: (b, g, 0, 0)),
                pl.BlockSpec((1, 1, rBp + 2 * N, Dp), lambda b, g, l: (b, g, 0, 0)),
                pl.BlockSpec((1, 1, Dp, rBp), lambda b, g, l: (b, g, 0, 0)),
                pl.BlockSpec((1, 1, Dp, 1), lambda b, g, l: (b, g, 0, 0)),
                pl.BlockSpec((1, 1, Dp, N), lambda b, g, l: (b, g, 0, 0)),
                pl.BlockSpec((1, 1, Dp, 1), lambda b, g, l: (b, g, 0, 0)),
            ],
            out_shape=[
                # dxz packed in the stream dtype (in-kernel arithmetic is f32;
                # the host previously converted separate (B,G,Dp,L)-sized f32
                # dx/dz to bf16 anyway — the packed bf16 output halves the
                # write traffic, kills the conversions AND the dx/dz concat
                # copy the autodiff of split/stack used to insert).
                # Param-grad accumulators stay f32.
                jax.ShapeDtypeStruct(xz.shape, xz.dtype),
                jax.ShapeDtypeStruct((Bsz, G, Dp, 8), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, G, rBp + 2 * N, Dp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, G, Dp, rBp), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, G, Dp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, G, Dp, N), jnp.float32),
                jax.ShapeDtypeStruct((Bsz, G, Dp, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Dp, N, 1), jnp.float32),
                pltpu.VMEM((Dp, N, 1), jnp.float32),
                pltpu.VMEM((Dp, T), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                # b/g grid axes carry no state; only the chunk axis is
                # sequential. The raised scoped-VMEM limit lets the bwd run
                # 32-channel scan sub-blocks (17.6 MB live at Dp=128, T=512).
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=32 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xz, xz, xz, cwb, xp, dtw, dtb, A, Dv, st, dout, *mask_ops)
        return outs

    @jax.custom_vjp
    def core(xz, cwb, xp, dtw, dtb, A, Dv):
        out, _ = _fwd_call(xz, cwb, xp, dtw, dtb, A, Dv)
        return out

    def core_fwd(xz, cwb, xp, dtw, dtb, A, Dv):
        out, st = _fwd_call(xz, cwb, xp, dtw, dtb, A, Dv)
        return out, (xz, cwb, xp, dtw, dtb, A, Dv, st)

    def core_bwd(res, dout):
        xz, cwb, xp, dtw, dtb, A, Dv, st = res
        # dout passes in its native (stream) dtype — the kernel casts to f32
        # on read (line `dout = dout_ref[0, 0].astype(jnp.float32)`)
        dxz, dcw, dxp, ddtw, ddtb, dA, dD = _bwd_call(
            xz, cwb, xp, dtw, dtb, A, Dv, st, dout
        )
        return (
            dxz.astype(xz.dtype),
            jnp.sum(dcw, axis=0).astype(cwb.dtype),
            jnp.sum(dxp, axis=0).astype(xp.dtype),
            jnp.sum(ddtw, axis=0).astype(dtw.dtype),
            jnp.sum(ddtb, axis=0),
            jnp.sum(dA, axis=0),
            jnp.sum(dD, axis=0),
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def mamba_fused_scan(
    xz: Array,          # (B, G, 2*D, L) packed in_proj output: x rows then z
    conv_w: Array,      # (G, D, W) depthwise causal conv taps
    conv_b: Optional[Array],  # (G, D) conv bias or None
    x_proj: Array,      # (G, R+2N, D)
    dt_w: Array,        # (G, D, R)
    dt_b: Array,        # (G, D)
    A: Array,           # (G, D, N), negative
    D_skip: Array,      # (G, D)
    reverse: bool = False,
    interpret: bool | None = None,
) -> Array:
    """Run the fused conv+projections+scan+gate for G same-direction groups.

    The causal depthwise conv + SiLU runs INSIDE the scan kernel (chunk halo
    from a neighbour-chunk BlockSpec view), mirroring the reference's
    `mamba_inner_fn_no_out_proj` fusion boundary exactly: the raw in_proj
    output goes in PACKED — rows [0:D) the conv/scan stream, rows [D:2D) the
    gate — and the kernel selects each half by BlockSpec index map, so
    separate x/z copies, dt/B/C and x_conv never touch HBM.

    Returns (B, G, D, L) gated scan outputs in the stream dtype (bf16 in
    perf configs; scan state stays f32 in-kernel). `reverse=True` scans every
    group right-to-left (the backward direction of bi-Mamba) with an
    anti-causal conv — no operand flips anywhere.
    """
    if interpret is None:
        interpret = not any(d.platform == "tpu" for d in jax.devices())
    Bsz, G, D2, L = xz.shape
    D = D2 // 2
    R = dt_w.shape[2]
    N = A.shape[2]
    W = conv_w.shape[2]
    assert D2 == 2 * D and conv_w.shape[1] == D, "xz must pack (x, z) along dim 2"
    assert N % 8 == 0, "d_state must be a multiple of 8 for the fused kernel"
    assert W <= 7, "conv width must fit the packed (taps..., bias) 8-lane tile"

    Dp = _round_up(D, 8)

    def pick_sb(cap):
        sb = Dp if Dp <= 32 else min(cap, Dp)
        while Dp % sb:
            sb += 8
        return sb

    # scan-loop sub-block: 32 channels for both directions; the bwd kernel's
    # larger live set (b/h/g/ginit/gah tiles + projection tiles) fits because
    # vmem_limit_bytes is raised to 32 MB in its CompilerParams
    SBf, SBb = pick_sb(32), pick_sb(32)
    rBp = _round_up(R, 8)
    # small-channel scans are grid-overhead bound: longer chunks trade a few
    # extra Hillis-Steele passes for 2-4x fewer grid steps (MMU_MEGA_T_SMALL
    # is the A/B knob; 1024 measured best at Dp=8..24). MMU_MEGA_T_BIG
    # re-sweeps the large-tile chunk under the SSD core (512 default was
    # tuned for the window-decay kernel).
    T = (int(os.environ.get("MMU_MEGA_T_SMALL", "1024")) if Dp <= 24
         else int(os.environ.get("MMU_MEGA_T_BIG", "512")))
    Lp = _round_up(L, T)

    cdtype = jnp.bfloat16 if xz.dtype == jnp.bfloat16 else xz.dtype
    pad_d, pad_l = Dp - D, Lp - L

    # (B, G, 2D, L) -> (B, G, 2, Dp, Lp): the row split is a free reshape;
    # the pad is a no-op at production sizes (D % 8 == 0, L % T == 0)
    xzp = xz.astype(cdtype).reshape(Bsz, G, 2, D, L)
    if pad_d or pad_l:
        xzp = jnp.pad(xzp, ((0, 0), (0, 0), (0, 0), (0, pad_d), (0, pad_l)))

    # conv taps in f32 lanes 0..W-1, bias in lane W (the kernel reads f32;
    # weights were already rounded to the stream dtype by the caller when
    # the caller computes in bf16)
    cwb = jnp.zeros((G, Dp, 8), jnp.float32)
    cwb = cwb.at[:, :D, :W].set(conv_w.astype(jnp.float32))
    if conv_b is not None:
        cwb = cwb.at[:, :D, W].set(conv_b.astype(jnp.float32))

    xp_pad = jnp.zeros((G, rBp + 2 * N, Dp), cdtype)
    xp_pad = xp_pad.at[:, :R, :D].set(x_proj[:, :R].astype(cdtype))
    xp_pad = xp_pad.at[:, rBp : rBp + N, :D].set(x_proj[:, R : R + N].astype(cdtype))
    xp_pad = xp_pad.at[:, rBp + N :, :D].set(x_proj[:, R + N :].astype(cdtype))
    dtw_pad = jnp.zeros((G, Dp, rBp), cdtype)
    dtw_pad = dtw_pad.at[:, :D, :R].set(dt_w.astype(cdtype))
    dtb_pad = jnp.pad(dt_b.astype(jnp.float32), ((0, 0), (0, pad_d)))[..., None]
    A_pad = jnp.pad(A.astype(jnp.float32), ((0, 0), (0, pad_d), (0, 0)))
    D_pad = jnp.pad(D_skip.astype(jnp.float32), ((0, 0), (0, pad_d)))[..., None]

    # SSD chunked-matmul scan core. Large-D tiles (RCG shapes) both
    # directions since round 4; round 5 extends it to the small-D MMConv
    # tiles' BACKWARD kernels (MMU_SSD_SMALL knob): their window-decay
    # recompute+adjoint burned ~45 VPU ops/element over log2(T) passes while
    # the paired SSD needs ~10 (MMC6 A/B: f+b 16.8 -> 9.6 ms). The small-D
    # FORWARD keeps the window core — its SSD variant measured SLOWER
    # (3.3 -> 4.2 ms: the M=8-row zrel/summary matmuls waste the MXU and the
    # lighter fwd can't amortise them).
    ssd_ok = T % 128 == 0 and os.environ.get("MMU_SSD", "1") != "0"
    big = min(SBf, SBb) >= 32
    use_ssd = (
        ssd_ok and (big or os.environ.get("MMU_SSD_SMALL_FWD", "0") != "0"),
        ssd_ok and (big or os.environ.get("MMU_SSD_SMALL", "1") != "0"),
    )
    core = _mega_core(T, Dp, SBf, SBb, N, rBp, W, L, bool(reverse),
                      bool(interpret), use_ssd)
    out = core(xzp, cwb, xp_pad, dtw_pad, dtb_pad, A_pad, D_pad)
    return out[:, :, :D, :L]
