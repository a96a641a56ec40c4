"""Prototype: tiled (SB, N, NT, 128) window-decay scan vs the 3-D layout.

The production kernels (`mm_unet_tpu/ops/mamba_fused.py`) scan (SB, N, T)
tiles with log2(T) Hillis-Steele passes whose rolls cross VREG lane
boundaries (T = 512/1024 lanes). The tiled layout splits T into NT segments
of 128 lanes: 7 local passes with in-VREG rolls scan each segment, a tiny
(SB, N, NT, 1) carry chain stitches segments, and ONE full-size broadcast
pass applies the carries — 8 full passes total independent of T.

    python benchmarks/tiled_proto.py [parity|time|all]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import os as _os
INTERP = bool(int(_os.environ.get("PROTO_INTERPRET", "0")))
LOCAL_ONLY = bool(int(_os.environ.get("PROTO_LOCAL_ONLY", "0")))
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

_LOG2E = 1.4426950408889634
_BIG = 1e30
SEG = 128


# --------------------------------------------------------------------------
# current 3-D scan (reference for timing/parity), minimal form
# --------------------------------------------------------------------------

def _wscan_fwd3(dt, A2, b):
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


def _kernel3(dt_ref, u_ref, Bv_ref, Cv_ref, A_ref, y_ref, h_ref, *, SB):
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    dt = dt_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)
    Bv = Bv_ref[0].astype(jnp.float32)
    Cv = Cv_ref[0].astype(jnp.float32)
    A2 = A_ref[...].astype(jnp.float32) * _LOG2E
    Dp, T = u.shape
    for i in range(Dp // SB):
        sl = slice(i * SB, (i + 1) * SB)
        dti, ui, A2i = dt[sl], u[sl], A2[sl]
        b = (dti * ui)[:, None, :] * Bv[None]
        a_e = jnp.exp2(dti[:, 0:1][:, None, :] * A2i[:, :, None])
        col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
        b = b + jnp.where(col == 0, a_e * h_ref[sl], 0.0)
        h = _wscan_fwd3(dti, A2i, b)
        h_ref[sl] = h[:, :, -1:]
        y_ref[0, sl, :] = jnp.sum(h * Cv[None], axis=1).astype(y_ref.dtype)


def scan3(dt, u, Bv, Cv, A, T):
    Bsz, Dp, L = u.shape
    N = A.shape[1]
    nL = L // T
    y = pl.pallas_call(
        functools.partial(_kernel3, SB=32),
        grid=(Bsz, nL),
        in_specs=[
            pl.BlockSpec((1, Dp, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((1, Dp, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((1, N, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((1, N, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((Dp, N), lambda b, l: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Dp, T), lambda b, l: (b, 0, l)),
        out_shape=jax.ShapeDtypeStruct(u.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((Dp, N, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERP,
    )(dt, u, Bv, Cv, A)
    return y


# --------------------------------------------------------------------------
# 3-D kernel with in-kernel 128-token sub-chunking: 7 passes per sub-chunk
# (vs log2(T) over the whole tile), carry folded sequentially in-register.
# Same op patterns as the production kernel; lane rolls stay in-VREG.
#
# MEASURED AND REJECTED (round 3): isolated microbench won on fwd
# (RCG2 G2 fwd 39.6 vs 42.3 ms) and washed on f+b (128.9 vs 127.5), but the
# full train step REGRESSED 16.05 -> 15.24 img/s with trace-measured scan
# time 318 -> 344 ms/step — the many small (SB, N, SC) intermediates defeat
# Mosaic's scheduling across the rest of the step. Kept as the record of the
# experiment; production kernels stay on full-T window-decay scans.
# --------------------------------------------------------------------------

def _kernel3s(dt_ref, u_ref, Bv_ref, Cv_ref, A_ref, y_ref, h_ref, *, SB, SC):
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    dt = dt_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)
    Bv = Bv_ref[0].astype(jnp.float32)
    Cv = Cv_ref[0].astype(jnp.float32)
    A2 = A_ref[...].astype(jnp.float32) * _LOG2E
    Dp, T = u.shape
    for i in range(Dp // SB):
        sl = slice(i * SB, (i + 1) * SB)
        A2i = A2[sl]
        hc = h_ref[sl]                       # (SB, N, 1) running carry
        ys = []
        for c in range(T // SC):
            cs = slice(c * SC, (c + 1) * SC)
            dti, ui = dt[sl, cs], u[sl, cs]  # (SB, SC)
            b = (dti * ui)[:, None, :] * Bv[:, cs][None]
            a_e = jnp.exp2(dti[:, 0:1][:, None, :] * A2i[:, :, None])
            col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
            b = b + jnp.where(col == 0, a_e * hc, 0.0)
            h = _wscan_fwd3(dti, A2i, b)
            hc = h[:, :, -1:]
            ys.append(jnp.sum(h * Cv[:, cs][None], axis=1))
        h_ref[sl] = hc
        y_ref[0, sl, :] = jnp.concatenate(ys, axis=1).astype(y_ref.dtype)


def scan3s(dt, u, Bv, Cv, A, T, SC=128, SB=32):
    Bsz, Dp, L = u.shape
    N = A.shape[1]
    nL = L // T
    y = pl.pallas_call(
        functools.partial(_kernel3s, SB=SB, SC=SC),
        grid=(Bsz, nL),
        in_specs=[
            pl.BlockSpec((1, Dp, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((1, Dp, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((1, N, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((1, N, T), lambda b, l: (b, 0, l)),
            pl.BlockSpec((Dp, N), lambda b, l: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Dp, T), lambda b, l: (b, 0, l)),
        out_shape=jax.ShapeDtypeStruct(u.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((Dp, N, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERP,
    )(dt, u, Bv, Cv, A)
    return y


# --------------------------------------------------------------------------
# tiled 4-D scan
# --------------------------------------------------------------------------

def _wscan_fwd4(dt4, A2i, b):
    """Local inclusive scan within each 128-lane segment.

    dt4: (SB, NT, 128); A2i: (SB, N, 1, 1) [A*log2e]; b: (SB, N, NT, 128).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, dt4.shape, 2)
    ws = dt4
    s = 1
    while s < SEG:
        wm = jnp.where(col >= s, ws, _BIG)
        b = jnp.exp2(wm[:, None] * A2i) * pltpu.roll(b, s, axis=3) + b
        if s * 2 < SEG:
            ws = ws + pltpu.roll(ws, s, axis=2)
        s *= 2
    return b


def _kernel4(dt_ref, u_ref, Bv_ref, Cv_ref, A_ref, y_ref, h_ref, *, SB):
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    dt = dt_ref[0].astype(jnp.float32)          # (Dp, NT, 128)
    u = u_ref[0].astype(jnp.float32)
    Bv = Bv_ref[0].astype(jnp.float32)          # (N, NT, 128)
    Cv = Cv_ref[0].astype(jnp.float32)
    Dp, NT, _ = u.shape
    N = Bv.shape[0]

    scol = jax.lax.broadcasted_iota(jnp.int32, (SB, N, NT, 1), 2)

    for i in range(Dp // SB):
        sl = slice(i * SB, (i + 1) * SB)
        dti, ui = dt[sl], u[sl]                 # (SB, NT, 128)
        A2i = A_ref[sl].astype(jnp.float32) * _LOG2E  # (SB, N, 1, 1)
        b = (dti * ui)[:, None] * Bv[None]      # (SB, N, NT, 128)
        h = _wscan_fwd4(dti, A2i, b)            # local scans, no chunk fold
        if LOCAL_ONLY:  # perf ablation: skip carry/broadcast (wrong results)
            h_ref[...] = jnp.zeros_like(h_ref)
            y_ref[0, sl] = jnp.sum(h * Cv[None], axis=1).astype(y_ref.dtype)
            continue
        # narrow (SB, N, NT, 1) machinery: same-shape ops only
        dtA = dti[:, None] * A2i                # full
        dec = jnp.exp2(jnp.sum(dtA, axis=3, keepdims=True))  # seg decay
        hseg = h[..., SEG - 1 : SEG]            # local segment finals
        hin = h_ref[sl]                         # rotated: entry state at seg 0
        bb = hseg + jnp.where(scol == 0, dec * hin, 0.0)
        aa = dec
        s = 1
        while s < NT:
            aas = pltpu.roll(aa, s, axis=2)
            bbs = pltpu.roll(bb, s, axis=2)
            m = scol >= s
            bb = jnp.where(m, aa * bbs, 0.0) + bb
            aa = jnp.where(m, aa * aas, aa)
            s *= 2
        # entry[j] = S[j-1] for j>=1, = h_in for j == 0
        entry = jnp.where(
            scol >= 1, pltpu.roll(bb, 1, axis=2), jnp.where(scol == 0, hin, 0.0)
        )
        # within-segment inclusive prefix p[t] (zero-fill doubling)
        ps = dti
        pcol = jax.lax.broadcasted_iota(jnp.int32, ps.shape, 2)
        s = 1
        while s < SEG:
            ps = ps + jnp.where(pcol >= s, pltpu.roll(ps, s, axis=2), 0.0)
            s *= 2
        h = h + jnp.exp2(ps[:, None] * A2i) * entry
        # exit state rotated to segment 0 for the next chunk
        h_ref[sl] = pltpu.roll(h[..., SEG - 1 : SEG], 1, axis=2)
        y_ref[0, sl] = jnp.sum(h * Cv[None], axis=1).astype(y_ref.dtype)


def scan4(dt, u, Bv, Cv, A, T):
    Bsz, Dp, L = u.shape
    N = A.shape[1]
    NT = T // SEG
    nL = L // T
    r4 = lambda v: v.reshape(v.shape[0], v.shape[1], L // SEG, SEG)  # noqa: E731
    y = pl.pallas_call(
        functools.partial(_kernel4, SB=32),
        grid=(Bsz, nL),
        in_specs=[
            pl.BlockSpec((1, Dp, NT, SEG), lambda b, l: (b, 0, l, 0)),
            pl.BlockSpec((1, Dp, NT, SEG), lambda b, l: (b, 0, l, 0)),
            pl.BlockSpec((1, N, NT, SEG), lambda b, l: (b, 0, l, 0)),
            pl.BlockSpec((1, N, NT, SEG), lambda b, l: (b, 0, l, 0)),
            pl.BlockSpec((Dp, N, 1, 1), lambda b, l: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Dp, NT, SEG), lambda b, l: (b, 0, l, 0)),
        out_shape=jax.ShapeDtypeStruct((Bsz, Dp, L // SEG, SEG), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Dp, N, NT, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERP,
    )(r4(dt), r4(u), r4(Bv), r4(Cv), A[:, :, None, None])
    return y.reshape(Bsz, Dp, L)


# --------------------------------------------------------------------------
# golden + harness
# --------------------------------------------------------------------------

def golden(dt, u, Bv, Cv, A):
    a = jnp.exp(dt[:, :, None, :] * A[None, :, :, None])  # (B, D, N, L)
    b = (dt * u)[:, :, None, :] * Bv[:, None]

    def step(h, ab):
        h = ab[0] * h + ab[1]
        return h, h

    _, hs = jax.lax.scan(
        step,
        jnp.zeros(a.shape[:3]),
        (jnp.moveaxis(a, 3, 0), jnp.moveaxis(b, 3, 0)),
    )
    h = jnp.moveaxis(hs, 0, 3)
    return jnp.sum(h * Cv[:, None], axis=2)


def timeit(f, args, n=5):
    def chain(m):
        def g(*a):
            s = 0.0
            first = a[0]
            for _ in range(m):
                out = f(first, *a[1:])
                s = s + jnp.sum(out)
                first = first + (s * 1e-20).astype(first.dtype)
            return s
        return jax.jit(g)

    f1, fn = chain(1), chain(n + 1)
    float(f1(*args)); float(fn(*args))
    t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(*args)); tn = time.perf_counter() - t0
    return (tn - t1) / n * 1e3


def make_args(B, D, N, L, dtype=jnp.float32, on_device=False):
    if on_device:  # avoid pushing ~1 GB through the axon tunnel
        k = jax.random.key(0)
        ks = jax.random.split(k, 5)
        f = lambda kk, *s: jax.random.normal(kk, s, jnp.float32)  # noqa
        dt = jax.nn.softplus(f(ks[0], B, D, L) * 0.5)
        u = f(ks[1], B, D, L)
        Bv = f(ks[2], B, N, L) * 0.5
        Cv = f(ks[3], B, N, L) * 0.5
        A = -jnp.exp(f(ks[4], D, N) * 0.3)
        out = tuple(x.astype(dtype) for x in (dt, u, Bv, Cv)) + (A,)
        return jax.tree_util.tree_map(jax.block_until_ready, out)
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa
    dt = jax.nn.softplus(f(B, D, L) * 0.5)
    u = f(B, D, L)
    Bv = f(B, N, L) * 0.5
    Cv = f(B, N, L) * 0.5
    A = -jnp.exp(f(D, N) * 0.3)
    return tuple(x.astype(dtype) for x in (dt, u, Bv, Cv)) + (A,)


def main(which="all"):
    if which in ("parity", "all"):
        args = make_args(2, 32, 16, 2048)
        ref = golden(*args)
        for name, fn, T in [("scan3 T512 ", scan3, 512), ("scan3s T512", scan3s, 512),
                            ("scan4 T1024", scan4, 1024)]:
            try:
                out = jax.jit(functools.partial(fn, T=T))(*args)
                err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
                print(f"{name}: rel err {err:.2e}")
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
    if which == "time3s":
        args = make_args(8, 128, 16, 65536, on_device=True)
        for T, SC, SB in ((1024, 128, 64), (1024, 128, 128), (4096, 128, 32),
                          (1024, 512, 32)):
            try:
                t = timeit(jax.jit(functools.partial(scan3s, T=T, SC=SC, SB=SB)), args)
                print(f"scan3s T{T:<4d} SC{SC} SB{SB}: {t:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"scan3s T{T} SC{SC} SB{SB}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    if which in ("time", "all", "time4"):
        args = make_args(8, 128, 16, 65536, on_device=True)
        if which != "time4":
            print(f"scan3 T512 : {timeit(jax.jit(functools.partial(scan3, T=512)), args):7.2f} ms")
            print(f"scan3 T1024: {timeit(jax.jit(functools.partial(scan3, T=1024)), args):7.2f} ms")
        for T in (1024, 2048) if which == "time4" else (1024, 2048, 4096):
            try:
                t = timeit(jax.jit(functools.partial(scan4, T=T)), args)
                print(f"scan4 T{T:<4d}: {t:7.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"scan4 T{T}: FAILED {type(e).__name__}: {str(e)[:300]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
