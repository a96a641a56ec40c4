"""Bisect which part of the tiled scan kernel trips Mosaic's gather error.

    python benchmarks/tiled_bisect.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

_LOG2E = 1.4426950408889634
_BIG = 1e30
SEG = 128
SB, N, NT = 32, 16, 8
Dp = 64
Bsz = 1
T = NT * SEG
L = 2 * T


def mk_kernel(stage):
    def kernel(dt_ref, u_ref, Bv_ref, Cv_ref, A_ref, y_ref, h_ref):
        li = pl.program_id(1)

        @pl.when(li == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

        dt = dt_ref[0].astype(jnp.float32)
        u = u_ref[0].astype(jnp.float32)
        Bv = Bv_ref[0].astype(jnp.float32)
        Cv = Cv_ref[0].astype(jnp.float32)

        lcol = jax.lax.broadcasted_iota(jnp.int32, (SB, N, NT, SEG), 3)
        scol = jax.lax.broadcasted_iota(jnp.int32, (SB, N, NT, 1), 2)

        for i in range(Dp // SB):
            sl = slice(i * SB, (i + 1) * SB)
            dti, ui = dt[sl], u[sl]
            A2i = A_ref[sl].astype(jnp.float32) * _LOG2E  # (SB, N, 1, 1)
            b = (dti * ui)[:, None] * Bv[None]
            if stage >= 1:  # fold chunk-entry state
                a_e = jnp.exp2(dti[:, None, :, 0:1] * A2i)
                hin = h_ref[sl]
                b = b + jnp.where((lcol == 0) & (scol == 0), a_e * hin, 0.0)
            if stage >= 2:  # local scan
                col = jax.lax.broadcasted_iota(jnp.int32, dti.shape, 2)
                ws = dti
                s = 1
                while s < SEG:
                    wm = jnp.where(col >= s, ws, _BIG)
                    b = jnp.exp2(wm[:, None] * A2i) * pltpu.roll(b, s, axis=3) + b
                    if s * 2 < SEG:
                        ws = ws + pltpu.roll(ws, s, axis=2)
                    s *= 2
            h = b
            entry = None
            if stage >= 3:  # carry chain
                hseg = h[..., SEG - 1 : SEG]
                dtsum = jnp.sum(dti, axis=2, keepdims=True)
                dec = jnp.exp2(dtsum[:, None] * A2i)
                aa, bb = dec, hseg
                s = 1
                while s < NT:
                    aas = pltpu.roll(aa, s, axis=2)
                    bbs = pltpu.roll(bb, s, axis=2)
                    m = scol >= s
                    bb = jnp.where(m, aa * bbs, 0.0) + bb
                    aa = jnp.where(m, aa * aas, aa)
                    s *= 2
                entry = jnp.where(scol >= 1, pltpu.roll(bb, 1, axis=2), 0.0)
            if stage >= 4:  # prefix + broadcast
                ps = dti
                pcol = jax.lax.broadcasted_iota(jnp.int32, ps.shape, 2)
                s = 1
                while s < SEG:
                    ps = ps + jnp.where(pcol >= s, pltpu.roll(ps, s, axis=2), 0.0)
                    s *= 2
                h = h + jnp.exp2(ps[:, None] * A2i) * entry
            if stage >= 5:  # exit-state write
                hlast = h[..., SEG - 1 : SEG]
                h_ref[sl] = jnp.sum(
                    jnp.where(scol == NT - 1, hlast, 0.0), axis=2, keepdims=True
                )
            y_ref[0, sl] = jnp.sum(h * Cv[None], axis=1).astype(y_ref.dtype)

    return kernel


def build(stage):
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa
    dt = jax.nn.softplus(f(Bsz, Dp, L // SEG, SEG) * 0.5)
    u = f(Bsz, Dp, L // SEG, SEG)
    Bv = f(Bsz, N, L // SEG, SEG) * 0.5
    Cv = f(Bsz, N, L // SEG, SEG) * 0.5
    A = -jnp.exp(f(Dp, N) * 0.3)[:, :, None, None]
    nL = L // T

    def go():
        return pl.pallas_call(
            mk_kernel(stage),
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
            scratch_shapes=[pltpu.VMEM((Dp, N, 1, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(dt, u, Bv, Cv, A)

    return go


def main():
    for stage in range(6):
        try:
            out = jax.jit(build(stage))()
            jax.block_until_ready(out)
            print(f"OK   stage {stage}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:200]
            print(f"FAIL stage {stage}: {type(e).__name__}: {msg}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
