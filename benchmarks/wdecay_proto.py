"""Prototype: full-domain exponent windows for the window-decay scan.

The production pass (`mamba_fused._wscan_fwd`) builds window sums ws on the
small (SB, T) dt tile and pays a (SB, 1, T) x (SB, N, 1) broadcast-multiply
by A2 EVERY pass to form the (SB, N, T) exponent — measured as the hot spot
(~1.2 ms/pass at RCG2 scale; exp2 and masks are free, r3 ablations).

Since window_sum(dt) * A2 == window_sum(dt * A2), the doubling can run
directly on the full (SB, N, T) exponent domain: dtA = dt * A2 is ONE
broadcast-multiply per chunk, and each pass is then
    wm = where(col >= s, wsA, -BIG);  b = exp2(wm) * roll(b, s) + b
    wsA = wsA + roll(wsA, s)
i.e. the per-pass broadcast-mult is replaced by a same-shape add + an extra
roll — and rolls hide almost entirely under the arith stream (rolls-only
8.6 ms vs arith-only 15.9 ms of a 17.1 ms kernel). dtA < 0 always (dt > 0
post-softplus, A2 < 0) so the window sums stay cancellation-free.

MEASURED AND REJECTED (round 3): parity is exact (both 2.1e-6 vs the f64
reference) but the full-domain variant is ~1.8x SLOWER at RCG2 scale —
scan3 19.5/20.5 ms vs scan3e 35.6/38.1 ms (T=512/1024, B8 D128 N16 L65536).
The extra full-size (SB, N, T) roll + add per pass costs far more than the
(SB, 1, T) x (SB, N, 1) broadcast-multiply it replaces: rolls do NOT hide
under arith once the roll stream doubles, and the small-tile ws doubling
the production kernel uses is effectively free. The production per-pass
structure stands.

    python benchmarks/wdecay_proto.py [parity|time|all]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

INTERP = bool(int(os.environ.get("PROTO_INTERPRET", "0")))

_LOG2E = 1.4426950408889634
_BIG = 1e30


def _wscan_fwd_exp(dtA, b):
    """Window-decay combine with doubling on the (SB, N, T) exponent domain."""
    T = b.shape[2]
    col3 = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
    ws = dtA
    s = 1
    while s < T:
        wm = jnp.where(col3 >= s, ws, -_BIG)
        b = jnp.exp2(wm) * pltpu.roll(b, s, axis=2) + b
        if s * 2 < T:
            ws = ws + pltpu.roll(ws, s, axis=2)
        s *= 2
    return b


def _kernel3e(dt_ref, u_ref, Bv_ref, Cv_ref, A_ref, y_ref, h_ref, *, SB):
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
        dtA = dti[:, None, :] * A2i[:, :, None]  # ONE broadcast-mult per chunk
        b = (dti * ui)[:, None, :] * Bv[None]
        a_e = jnp.exp2(dtA[:, :, 0:1])
        col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
        b = b + jnp.where(col == 0, a_e * h_ref[sl], 0.0)
        h = _wscan_fwd_exp(dtA, b)
        h_ref[sl] = h[:, :, -1:]
        y_ref[0, sl, :] = jnp.sum(h * Cv[None], axis=1).astype(y_ref.dtype)


def scan3e(dt, u, Bv, Cv, A, T):
    Bsz, Dp, L = u.shape
    N = A.shape[1]
    nL = L // T
    return pl.pallas_call(
        functools.partial(_kernel3e, SB=32),
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


def _ref(dt, u, Bv, Cv, A):
    """Associative-scan reference (f64 accumulate via f32 scan on np)."""
    B, D, L = u.shape
    N = A.shape[1]
    dtn, un = np.asarray(dt, np.float64), np.asarray(u, np.float64)
    Bn, Cn = np.asarray(Bv, np.float64), np.asarray(Cv, np.float64)
    An = np.asarray(A, np.float64)
    y = np.zeros((B, D, L))
    for b in range(B):
        h = np.zeros((D, N))
        for t in range(L):
            a = np.exp(An * dtn[b, :, t : t + 1])
            h = a * h + (dtn[b, :, t] * un[b, :, t])[:, None] * Bn[b, :, t][None]
            y[b, :, t] = h @ Cn[b, :, t]
    return y


def main(which: str = "all") -> int:
    from benchmarks.tiled_proto import scan3  # current 3-D layout baseline

    rng = np.random.default_rng(0)

    if which in ("parity", "all"):
        B, D, L, N, T = 2, 32, 1536, 16, 512
        dt = jnp.asarray(np.log1p(np.exp(rng.standard_normal((B, D, L)))), jnp.float32) * 0.3
        u = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
        Bv = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
        Cv = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
        A = jnp.asarray(-np.exp(rng.standard_normal((D, N)) * 0.5), jnp.float32)
        ref = _ref(dt, u, Bv, Cv, A)
        for name, fn in (("scan3", scan3), ("scan3e", scan3e)):
            y = np.asarray(fn(dt, u, Bv, Cv, A, T))
            err = np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"{name} rel err vs ref: {err:.2e}")

    if which in ("time", "all"):
        from benchmarks.components import bench_chain

        B, D, L, N = 8, 128, 65536, 16  # RCG2 single-direction scale
        dt = jnp.asarray(np.log1p(np.exp(rng.standard_normal((B, D, L)))), jnp.float32) * 0.3
        u = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
        Bv = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
        Cv = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
        A = jnp.asarray(-np.exp(rng.standard_normal((D, N)) * 0.5), jnp.float32)
        for T in (512, 1024):
            for name, fn in (("scan3", scan3), ("scan3e", scan3e)):
                t = bench_chain(lambda d_, u_: fn(d_, u_, Bv, Cv, A, T), (dt, u))
                print(f"{name} T={T}: {t:7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
