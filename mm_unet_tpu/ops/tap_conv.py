"""Fused morph-0 deformable row-sample + (k,1)-stride-k conv Pallas kernel.

The reference's morph-0 DSConv samples a (B, H*K, W, C) deformed tensor with
`grid_sample` and immediately convolves it with a (k,1) stride-(k,1) kernel
(`/root/reference/src/UM_Net/MMUNet.py:218-227,245-250`) — per output pixel,
a weighted sum over K taps, where tap j reads column w+dx_j at a fractional
row y[b,h,w,j] (bilinear between floor/ceil rows).

The XLA formulation (`models/mm_unet._TapConv`) expresses the row
interpolation as a 2-hot (H_out x H_src) "hat" matrix per (b, w, tap) and
contracts it on the MXU — correct, but the hat is 2-sparse: the matmul
spends S/2 = 128x the useful FLOPs and the (B, H, W, K, H_src) hat tensor
lives in HBM.

This kernel does the sampling as a VPU **lane gather**: features ride
W-major, row-minor (B, W, C, S) so each tap is two `take_along_axis` lane
gathers (floor/ceil rows) + a lerp, done piecewise over 128-lane source
vregs (Mosaic gathers within one source vreg; `pltpu.repeat` materialises
the per-row index across sublanes — a plain broadcast lowers to an
unsupported replicated-layout i32 broadcast). The channel projection is one
(K*C, F) x (K*C, Ho) MXU dot per column. Measured vs the hat-matmul kernel
at stage-1 geometry (S=Ho=256, C=64, K=3): 0.88 ms vs 2.2 ms forward.

Column taps cross pallas tile boundaries through neighbour-block views (same
trick as the megakernel conv halo); out-of-range columns replicate the edge
column, matching `_TapConv`'s clamped shifts.

Backward (custom VJP) re-gathers the taps and emits dyc (lerp slope),
dkernel and dbias directly; only dfeat — the adjoint scatter of the gather,
which Mosaic cannot express — uses one hat-matmul per (w, tap):
dfeatT = dtapT @ hat, accumulated in a (TW + 2*hw, C, S) scratch whose halo
columns are folded on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _xs_col(fc_ref, fl_ref, fr_ref, c, TW, i, nW):
    """Source column c (may be out of [0, TW)) of the centre tile as (C, S),
    reading the neighbour tile across the edge, or replicating the edge
    column at the sequence boundary (clamped-shift semantics of `_TapConv`)."""
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


def _gather_tap(xs, yc_row, C, S, Ho):
    """Bilinear row-sample of one column: xs (C, S) f32, yc_row (1, Ho) f32
    pre-clipped to [0, S-1] -> (tap (C, Ho) f32, lo, hi, frac).

    Mosaic lane-gathers address a single 128-lane source vreg, so the source
    is walked in 128-lane pieces with a select; indices/fracs are
    sublane-materialised with pltpu.repeat (vector.broadcast of i32 from a
    1-sublane vreg is not implemented)."""
    fl = jnp.clip(jnp.floor(yc_row), 0, max(S - 2, 0))  # (1, Ho)
    frac = pltpu.repeat(yc_row - fl, C, axis=0)  # (C, Ho)
    idx = pltpu.repeat(fl.astype(jnp.int32), C, axis=0)
    # the lowering requires idx.shape == source.shape, so for each <=128-lane
    # output chunk (width qw) the source rows are walked in qw-wide pieces —
    # NOT fixed 128-wide ones: when Ho % 128 != 0 (e.g. the 704² STARE
    # protocol's S = 176 stage maps) the ragged output chunk is NARROWER
    # than a full source piece, and padding a 128-wide piece "to" qw=48 was
    # a negative pad (the round-3/4 silent 704-leg failure)
    nQ = -(-Ho // 128)
    los, his = [], []
    for q in range(nQ):
        qs = q * 128
        qw = min(128, Ho - qs)
        iq = idx[:, qs : qs + qw]
        lo = jnp.zeros((C, qw), jnp.float32)
        hi = jnp.zeros((C, qw), jnp.float32)
        for p in range(-(-S // qw)):
            ps = p * qw
            piece = xs[:, ps : min(ps + qw, S)]
            pw = piece.shape[1]
            if pw < qw:  # ragged source tail: pad up to the chunk width
                piece = jnp.pad(piece, ((0, 0), (0, qw - pw)))
            g = jnp.take_along_axis(piece, jnp.clip(iq - ps, 0, pw - 1), axis=1)
            lo = jnp.where((iq >= ps) & (iq < ps + pw), g, lo)
            g1 = jnp.take_along_axis(piece, jnp.clip(iq + 1 - ps, 0, pw - 1), axis=1)
            hi = jnp.where((iq + 1 >= ps) & (iq + 1 < ps + pw), g1, hi)
        los.append(lo)
        his.append(hi)
    lo = los[0] if nQ == 1 else jnp.concatenate(los, axis=1)
    hi = his[0] if nQ == 1 else jnp.concatenate(his, axis=1)
    return lo * (1.0 - frac) + hi * frac, lo, hi, frac


def _tap_fwd_kernel(fc_ref, fl_ref, fr_ref, yc_ref, kb_ref, b_ref, out_ref,
                    *, K, TW, S, Ho, shifts, nW):
    i = pl.program_id(1)
    C = fc_ref.shape[2]
    F = kb_ref.shape[2]
    cdt = fc_ref.dtype
    kcat = kb_ref[...].reshape(K * C, F)
    for w in range(TW):
        taps = []
        for j, dx in enumerate(shifts):
            xs = _xs_col(fc_ref, fl_ref, fr_ref, w + dx, TW, i, nW)
            tap, _, _, _ = _gather_tap(
                xs.astype(jnp.float32), yc_ref[0, w, j][None], C, S, Ho
            )
            taps.append(tap.astype(cdt))
        tcat = jnp.concatenate(taps, axis=0)  # (K*C, Ho)
        prj = jax.lax.dot_general(  # kcat^T @ tcat -> (F, Ho)
            kcat, tcat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, w] = (prj + b_ref[...]).astype(out_ref.dtype)


def _tap_bwd_kernel(fc_ref, fl_ref, fr_ref, yc_ref, kb_ref, dy_ref,
                    df_ref, dh_ref, dyc_ref, dk_ref, ds_ref,
                    *, K, TW, S, Ho, shifts, nW, hw):
    i = pl.program_id(1)
    C = fc_ref.shape[2]

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])

    ds_ref[...] = jnp.zeros_like(ds_ref)  # (TW + 2hw, C, S) column accumulator

    for w in range(TW):
        dy = dy_ref[0, w].astype(jnp.float32)  # (F, Ho)
        dy_c = dy.astype(fc_ref.dtype)
        for j, dx in enumerate(shifts):
            xs = _xs_col(fc_ref, fl_ref, fr_ref, w + dx, TW, i, nW)
            yc = yc_ref[0, w, j]  # (Ho,) f32
            tap, lo, hi, _ = _gather_tap(
                xs.astype(jnp.float32), yc[None], C, S, Ho
            )
            # dkernel[j] += tap @ dy^T -> (C, F)
            dk_ref[0, j] += jax.lax.dot_general(
                tap.astype(fc_ref.dtype), dy_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dtapT = kb[j] @ dy -> (C, Ho)
            dtap = jax.lax.dot_general(
                kb_ref[j], dy_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dyc: lerp slope hi - lo (the hat subgradient at fractional yc)
            dyc_ref[0, w, j] = jnp.sum(dtap * (hi - lo), axis=0)
            # dfeat: adjoint of the row gather — the only hat matmul left:
            # dfeatT (C, S) = dtapT @ hat^T with hat (S, Ho)
            mt = _hat_t(yc, S, Ho, fc_ref.dtype)
            dxs = jax.lax.dot_general(
                dtap.astype(fc_ref.dtype), mt, (((1,), (1,)), ((), ())),
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
    """core(ft (B,W,C,S), yt (B,W,K,Ho) f32, kb (K,C,F), bias (F,1)) ->
    out (B,W,F,Ho). Ho == S (output rows == source rows for morph-0)."""
    Ho = S
    nW = W // TW
    hw = max((abs(d) for d in shifts), default=0)
    cdtype = jnp.dtype(cdtype_name)

    kf = functools.partial(_tap_fwd_kernel, K=K, TW=TW, S=S, Ho=Ho,
                           shifts=shifts, nW=nW)
    kb_k = functools.partial(_tap_bwd_kernel, K=K, TW=TW, S=S, Ho=Ho,
                             shifts=shifts, nW=nW, hw=max(hw, 1))

    fspec = [
        pl.BlockSpec((1, TW, C, S), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, TW, C, S), lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)),
        pl.BlockSpec((1, TW, C, S), lambda b, i: (b, jnp.minimum(i + 1, nW - 1), 0, 0)),
    ]
    yspec = pl.BlockSpec((1, TW, K, Ho), lambda b, i: (b, i, 0, 0))
    kspec = pl.BlockSpec((K, C, F), lambda b, i: (0, 0, 0))

    def _fwd_call(ft, yt, kb32, bias):
        return pl.pallas_call(
            kf,
            grid=(B, nW),
            in_specs=fspec + [
                yspec, kspec,
                pl.BlockSpec((F, 1), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TW, F, Ho), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, W, F, Ho), cdtype),
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
                              pl.BlockSpec((1, TW, F, Ho), lambda b, i: (b, i, 0, 0))],
            out_specs=[
                pl.BlockSpec((1, TW, C, S), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, 2 * hww, C, S), lambda b, i: (b, i, 0, 0, 0)),
                pl.BlockSpec((1, TW, K, Ho), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((1, K, C, F), lambda b, i: (b, 0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, W, C, S), cdtype),
                jax.ShapeDtypeStruct((B, nW, 2 * hww, C, S), cdtype),
                jax.ShapeDtypeStruct((B, W, K, Ho), jnp.float32),
                jax.ShapeDtypeStruct((B, K, C, F), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((TW + 2 * hww, C, S), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                # the TW*K-unrolled tap loop's live temps (dtap/dxs/lo/hi per
                # iteration) overflow the default 16 MB scoped-VMEM stack at
                # the C=512 stage — same raised limit as the megakernel bwd
                vmem_limit_bytes=32 * 1024 * 1024,
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
        dft = df.astype(jnp.float32).reshape(B, nW, TW, C, S)
        for g in range(hww):
            hl = dh[:, :, g].astype(jnp.float32)  # (B, nW, C, S)
            hr = dh[:, :, hww + g].astype(jnp.float32)
            dft = dft.at[:, :-1, TW - (hww - g)].add(hl[:, 1:])
            dft = dft.at[:, 0, 0].add(hl[:, 0])  # clamped at w=0
            dft = dft.at[:, 1:, g].add(hr[:, :-1])
            dft = dft.at[:, -1, TW - 1].add(hr[:, -1])  # clamped at w=W-1
        df = dft.reshape(B, W, C, S).astype(ft.dtype)
        dbias = jnp.sum(dout.astype(jnp.float32), axis=(0, 1, 3))
        return df, dyc, jnp.sum(dk, axis=0), dbias[:, None]

    core.defvjp(core_fwd, core_bwd)
    return core


def tap_conv(
    feat: Array,     # (B, H, W, C)
    y_coords: Array,  # (B, H, W, K) f32 row coordinates
    kernel: Array,   # (K, 1, C, F) — nn.Conv-compatible (k,1) kernel
    bias: Array,     # (F,)
    x_shifts,        # K column shifts (python ints)
    interpret: bool | None = None,
) -> Array:
    """Fused deform-row-sample + tap-conv. Matches `_TapConv`'s XLA matmul
    path (same clamped shifts and 2-hot row interpolation; bf16 streams round
    at the same points)."""
    if interpret is None:
        interpret = not any(d.platform == "tpu" for d in jax.devices())
    B, H, W, C = feat.shape
    K = y_coords.shape[-1]
    F = kernel.shape[-1]
    TW = 8
    assert W % TW == 0, f"tap_conv needs W % {TW} == 0, got {W}"
    ft = feat.transpose(0, 2, 3, 1)  # (B, W, C, S)
    yt = jnp.clip(y_coords.astype(jnp.float32), 0, H - 1).transpose(0, 2, 3, 1)
    # the kernel param stays f32 into the core (cast to the stream dtype
    # happens inside) so its gradient comes back f32-accumulated
    kb32 = kernel.reshape(K, C, F).astype(jnp.float32)
    core = _tap_core(B, H, W, C, F, K, TW, tuple(int(s) for s in x_shifts),
                     jnp.dtype(feat.dtype).name, bool(interpret))
    out = core(ft, yt, kb32, bias.astype(jnp.float32)[:, None])  # (B, W, F, Ho)
    return out.transpose(0, 3, 1, 2)
