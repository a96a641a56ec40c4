"""Fused morph-0 deformable row-sample + (k,1)-stride-k conv Pallas kernel.

The reference's morph-0 DSConv samples a (B, H*K, W, C) deformed tensor with
`grid_sample` and immediately convolves it with a (k,1) stride-(k,1) kernel
(`/root/reference/src/UM_Net/MMUNet.py:218-227,245-250`) — per output pixel,
a weighted sum over K taps, where tap j reads column w+dx_j at a fractional
row y[b,h,w,j] (bilinear between floor/ceil rows).

The XLA formulation (`models/mm_unet._TapConv`) expresses the row
interpolation as a 2-hot (H_out x H_src) "hat" matrix per (b, w, tap) and
contracts it on the MXU — correct and fast, but the hat tensor
(B, H, W, K, H_src) is materialised in HBM: ~0.8 GB per build at the 256²
stage, re-read by every tap einsum and rebuilt in backward (~20 ms/step of
pure HBM traffic across the MM_Net stages, profiled round 3).

This kernel builds the hat matrix ONE (H_src, H_out) tile at a time in VMEM
and runs both contractions (sample + channel projection) in-kernel, so the
hat never touches HBM. Column taps cross pallas tile boundaries through
neighbour-block views (same trick as the megakernel conv halo); out-of-range
columns replicate the edge column, matching `_TapConv`'s clamped shifts.

Work layout: grid (B, W/TW); operands transposed to W-major (B, W, H, C) on
the host so per-column (H, C) slices are layout-free in-kernel.

Backward (custom VJP) recomputes the hat tiles and emits dfeat (with a
2*hw-column halo side-output folded on the host), dyc, dkernel, dbias.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _xs_col(fc_ref, fl_ref, fr_ref, c, TW, i, nW):
    """Source column c (may be out of [0, TW)) of the centre tile, reading the
    neighbour tile across the edge, or replicating the edge column at the
    sequence boundary (clamped-shift semantics of `_TapConv`)."""
    if 0 <= c < TW:
        return fc_ref[0, c]
    if c < 0:
        edge = fc_ref[0, 0]
        return jnp.where(i > 0, fl_ref[0, TW + c], edge)
    edge = fc_ref[0, TW - 1]
    return jnp.where(i < nW - 1, fr_ref[0, c - TW], edge)


def _hat_t(yc_lane, S, Ho, cdtype):
    """Transposed 2-hot bilinear hat: (S, Ho) with hat[s, h] =
    max(0, 1 - |s - yc[h]|). yc_lane is the (Ho,) f32 row-coordinate vector
    (already clipped to [0, S-1])."""
    s_io = jax.lax.broadcasted_iota(jnp.int32, (S, Ho), 0).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(s_io - yc_lane[None, :])).astype(cdtype)


def _tap_fwd_kernel(fc_ref, fl_ref, fr_ref, yc_ref, kb_ref, b_ref, out_ref,
                    *, K, TW, S, Ho, shifts, nW):
    i = pl.program_id(1)
    for w in range(TW):
        acc = None
        for j, dx in enumerate(shifts):
            xs = _xs_col(fc_ref, fl_ref, fr_ref, w + dx, TW, i, nW)  # (S, C)
            mt = _hat_t(yc_ref[0, w, j], S, Ho, xs.dtype)  # (S, Ho)
            tap = jax.lax.dot_general(  # m @ xs -> (Ho, C)
                mt, xs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xs.dtype)
            prj = jax.lax.dot_general(  # tap @ kb[j] -> (Ho, F)
                tap, kb_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = prj if acc is None else acc + prj
        out_ref[0, w] = (acc + b_ref[0]).astype(out_ref.dtype)


def _tap_bwd_kernel(fc_ref, fl_ref, fr_ref, yc_ref, kb_ref, dy_ref,
                    df_ref, dh_ref, dyc_ref, dk_ref, ds_ref,
                    *, K, TW, S, Ho, shifts, nW, hw):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])

    ds_ref[...] = jnp.zeros_like(ds_ref)  # (TW + 2hw, S, C) column accumulator

    for w in range(TW):
        dy = dy_ref[0, w].astype(jnp.float32)  # (Ho, F)
        for j, dx in enumerate(shifts):
            xs = _xs_col(fc_ref, fl_ref, fr_ref, w + dx, TW, i, nW)  # (S, C)
            yc = yc_ref[0, w, j]  # (Ho,) f32
            mt = _hat_t(yc, S, Ho, xs.dtype)
            dtap = jax.lax.dot_general(  # dy @ kb[j]^T -> (Ho, C)
                dy.astype(xs.dtype), kb_ref[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dkernel[j] += tap^T @ dy
            tap = jax.lax.dot_general(
                mt, xs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xs.dtype)
            dk_ref[0, j] += jax.lax.dot_general(
                tap, dy.astype(xs.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dyc: dm[s,h] = xs @ dtap^T; dyc[h] = sum_s dm * dhat/dyc
            dtap_c = dtap.astype(xs.dtype)
            dmt = jax.lax.dot_general(  # (S, Ho)
                xs, dtap_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d = jax.lax.broadcasted_iota(jnp.int32, (S, Ho), 0).astype(jnp.float32) - yc[None, :]
            ghat = jnp.where(jnp.abs(d) < 1.0, jnp.sign(d), 0.0)
            dyc_ref[0, w, j] = jnp.sum(dmt * ghat, axis=0)
            # dfeat column: m^T-grad: dxs = m @ dtap -> (S, C)
            dxs = jax.lax.dot_general(
                mt, dtap_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds_ref[hw + w + dx] += dxs

    for c in range(TW):
        df_ref[0, c] = ds_ref[hw + c].astype(df_ref.dtype)
    for g in range(hw):  # left halo columns -hw..-1, right TW..TW+hw-1
        dh_ref[0, 0, g] = ds_ref[g].astype(dh_ref.dtype)
        dh_ref[0, 0, hw + g] = ds_ref[hw + TW + g].astype(dh_ref.dtype)


@functools.lru_cache(maxsize=None)
def _tap_core(B: int, S: int, W: int, C: int, F: int, K: int, TW: int,
              shifts: tuple, cdtype_name: str, interpret: bool):
    """core(ft (B,W,S,C), yt (B,W,K,Ho) f32, kb (K,C,F), bias (1,F)) ->
    out (B,W,Ho,F). Ho == S (output rows == source rows for morph-0)."""
    Ho = S
    nW = W // TW
    hw = max((abs(d) for d in shifts), default=0)
    cdtype = jnp.dtype(cdtype_name)

    kf = functools.partial(_tap_fwd_kernel, K=K, TW=TW, S=S, Ho=Ho,
                           shifts=shifts, nW=nW)
    kb_k = functools.partial(_tap_bwd_kernel, K=K, TW=TW, S=S, Ho=Ho,
                             shifts=shifts, nW=nW, hw=max(hw, 1))

    fspec = [
        pl.BlockSpec((1, TW, S, C), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, TW, S, C), lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)),
        pl.BlockSpec((1, TW, S, C), lambda b, i: (b, jnp.minimum(i + 1, nW - 1), 0, 0)),
    ]
    yspec = pl.BlockSpec((1, TW, K, Ho), lambda b, i: (b, i, 0, 0))
    kspec = pl.BlockSpec((K, C, F), lambda b, i: (0, 0, 0))

    def _fwd_call(ft, yt, kb32, bias):
        return pl.pallas_call(
            kf,
            grid=(B, nW),
            in_specs=fspec + [
                yspec, kspec,
                pl.BlockSpec((1, F), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TW, Ho, F), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, W, Ho, F), cdtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(ft, ft, ft, yt, kb32.astype(cdtype), bias)

    def _bwd_call(ft, yt, kb32, dout):
        hww = max(hw, 1)
        df, dh, dyc, dk = pl.pallas_call(
            kb_k,
            grid=(B, nW),
            in_specs=fspec + [yspec, kspec,
                              pl.BlockSpec((1, TW, Ho, F), lambda b, i: (b, i, 0, 0))],
            out_specs=[
                pl.BlockSpec((1, TW, S, C), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, 2 * hww, S, C), lambda b, i: (b, i, 0, 0, 0)),
                pl.BlockSpec((1, TW, K, Ho), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((1, K, C, F), lambda b, i: (b, 0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, W, S, C), cdtype),
                jax.ShapeDtypeStruct((B, nW, 2 * hww, S, C), cdtype),
                jax.ShapeDtypeStruct((B, W, K, Ho), jnp.float32),
                jax.ShapeDtypeStruct((B, K, C, F), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((TW + 2 * hww, S, C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(ft, ft, ft, yt, kb32.astype(cdtype), dout)
        return df, dh, dyc, dk

    @jax.custom_vjp
    def core(ft, yt, kb32, bias):
        return _fwd_call(ft, yt, kb32, bias)

    def core_fwd(ft, yt, kb32, bias):
        return _fwd_call(ft, yt, kb32, bias), (ft, yt, kb32)

    def core_bwd(res, dout):
        ft, yt, kb32 = res
        hww = max(hw, 1)
        df, dh, dyc, dk = _bwd_call(ft, yt, kb32, dout)
        # fold the cross-tile halo columns back in: tile i's left halo g
        # lands on column i*TW - hww + g (clamped to 0 at tile 0 — the
        # kernel read the edge-replicated column there), right halo g on
        # column (i+1)*TW + g (clamped to W-1 at the last tile).
        dft = df.astype(jnp.float32).reshape(B, nW, TW, S, C)
        for g in range(hww):
            hl = dh[:, :, g].astype(jnp.float32)  # (B, nW, S, C)
            hr = dh[:, :, hww + g].astype(jnp.float32)
            dft = dft.at[:, :-1, TW - (hww - g)].add(hl[:, 1:])
            dft = dft.at[:, 0, 0].add(hl[:, 0])  # clamped at w=0
            dft = dft.at[:, 1:, g].add(hr[:, :-1])
            dft = dft.at[:, -1, TW - 1].add(hr[:, -1])  # clamped at w=W-1
        df = dft.reshape(B, W, S, C).astype(ft.dtype)
        dbias = jnp.sum(dout.astype(jnp.float32), axis=(0, 1, 2))
        return df, dyc, jnp.sum(dk, axis=0), dbias[None]

    core.defvjp(core_fwd, core_bwd)
    return core


def tap_conv(
    feat: Array,     # (B, H, W, C)
    y_coords: Array,  # (B, H, W, K) f32 row coordinates, clipped to [0, H-1]
    kernel: Array,   # (K, 1, C, F) — nn.Conv-compatible (k,1) kernel
    bias: Array,     # (F,)
    x_shifts,        # K column shifts (python ints)
    interpret: bool | None = None,
) -> Array:
    """Fused deform-row-sample + tap-conv. Matches `_TapConv`'s XLA matmul
    path bit-for-bit in f32 (identical contraction order; bf16 streams round
    at the same points)."""
    if interpret is None:
        interpret = not any(d.platform == "tpu" for d in jax.devices())
    B, H, W, C = feat.shape
    K = y_coords.shape[-1]
    F = kernel.shape[-1]
    TW = 8
    assert W % TW == 0, f"tap_conv needs W % {TW} == 0, got {W}"
    ft = feat.transpose(0, 2, 1, 3)  # (B, W, H, C)
    yt = jnp.clip(y_coords.astype(jnp.float32), 0, H - 1).transpose(0, 2, 3, 1)
    # the kernel param stays f32 into the core (cast to the stream dtype
    # happens inside) so its gradient comes back f32-accumulated
    kb32 = kernel.reshape(K, C, F).astype(jnp.float32)
    core = _tap_core(B, H, W, C, F, K, TW, tuple(int(s) for s in x_shifts),
                     jnp.dtype(feat.dtype).name, bool(interpret))
    out = core(ft, yt, kb32, bias.astype(jnp.float32)[None])  # (B, W, H, F)
    return out.transpose(0, 2, 1, 3)
