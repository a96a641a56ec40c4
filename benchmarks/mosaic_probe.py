"""Probe which shape idioms Mosaic supports on this TPU, to pin down the
tiled-scan kernel plumbing. Each probe is a tiny standalone pallas_call.

    python benchmarks/mosaic_probe.py
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

SB, N, NT, SEG = 8, 16, 4, 128


def run(name, fn):
    try:
        out = jax.jit(fn)()
        jax.block_until_ready(out)
        print(f"OK   {name}: {np.asarray(out).ravel()[:2]}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def main():
    x2 = jnp.ones((SB, N), jnp.float32)
    x4 = jnp.ones((SB, N, NT, SEG), jnp.float32)

    # 1. rank expansion (SB,N) -> (SB,N,1,1) via indexing-None
    def k1(a_ref, b_ref, o_ref):
        a = a_ref[...][:, :, None, None]
        o_ref[...] = b_ref[...] * a

    run("expand [:,:,None,None]", lambda: pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((SB, N, NT, SEG), jnp.float32),
    )(x2, x4))

    # 2. rank expansion via lax.broadcast_in_dim
    def k2(a_ref, b_ref, o_ref):
        a = jax.lax.broadcast_in_dim(a_ref[...], (SB, N, 1, 1), (0, 1))
        o_ref[...] = b_ref[...] * a

    run("broadcast_in_dim (SB,N)->(SB,N,1,1)", lambda: pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((SB, N, NT, SEG), jnp.float32),
    )(x2, x4))

    # 3. (...,1,1) slice extraction
    def k3(b_ref, o_ref):
        o_ref[...] = b_ref[...] + b_ref[:, :, NT - 1 : NT, SEG - 1 : SEG]

    run("slice to (...,1,1)", lambda: pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((SB, N, NT, SEG), jnp.float32),
    )(x4))

    # 4. 4-D VMEM scratch with trailing unit dims + masked-reduce write
    def k4(b_ref, o_ref, h_ref):
        scol = jax.lax.broadcasted_iota(jnp.int32, (SB, N, NT, 1), 2)
        h_ref[...] = jnp.sum(
            jnp.where(scol == NT - 1, b_ref[..., SEG - 1 : SEG], 0.0),
            axis=2, keepdims=True,
        )
        o_ref[...] = b_ref[...] * h_ref[...]

    run("scratch (SB,N,1,1) + masked reduce", lambda: pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((SB, N, NT, SEG), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SB, N, 1, 1), jnp.float32)],
    )(x4))

    # 5. 5-D blocks
    x5 = jnp.ones((2, 3, SB, NT, SEG), jnp.float32)

    def k5(b_ref, o_ref):
        o_ref[...] = b_ref[...] * 2.0

    run("5-D block (1,1,SB,NT,SEG)", lambda: pl.pallas_call(
        k5,
        grid=(2, 3),
        in_specs=[pl.BlockSpec((1, 1, SB, NT, SEG), lambda i, j: (i, j, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, SB, NT, SEG), lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 3, SB, NT, SEG), jnp.float32),
    )(x5))

    # 6. 3-D dot_general: (R, D) x (D, NT, SEG) -> (R, NT, SEG) on the MXU
    R, D = 48, 128
    a = jnp.ones((R, D), jnp.bfloat16)
    b = jnp.ones((D, NT, SEG), jnp.bfloat16)

    def k6(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run("dot (R,D)x(D,NT,SEG)", lambda: pl.pallas_call(
        k6,
        out_shape=jax.ShapeDtypeStruct((R, NT, SEG), jnp.float32),
    )(a, b))

    # 7. transposed 3-D dot: contract first dims (D,R)x(D,NT,SEG)
    a2 = jnp.ones((D, R), jnp.bfloat16)

    def k7(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run("dotT (D,R)x(D,NT,SEG)", lambda: pl.pallas_call(
        k7,
        out_shape=jax.ShapeDtypeStruct((R, NT, SEG), jnp.float32),
    )(a2, b))

    # 8. 3-D dot with 3-D on the LHS free side: (SB,NT,SEG)x? -> grad-style
    #    contraction over (NT,SEG): (R,NT,SEG) x (D,NT,SEG) -> (R,D)
    c = jnp.ones((R, NT, SEG), jnp.bfloat16)
    d = jnp.ones((D, NT, SEG), jnp.bfloat16)

    def k8(c_ref, d_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            c_ref[...], d_ref[...], (((1, 2), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run("dot contract (NT,SEG) pair", lambda: pl.pallas_call(
        k8,
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
    )(c, d))

    # 9. middle expansion (SB,NT,SEG) -> (SB,1,NT,SEG)
    x3 = jnp.ones((SB, NT, SEG), jnp.float32)

    def k9(a_ref, b_ref, o_ref):
        o_ref[...] = b_ref[...] * a_ref[...][:, None]

    run("expand middle [:,None]", lambda: pl.pallas_call(
        k9,
        out_shape=jax.ShapeDtypeStruct((SB, N, NT, SEG), jnp.float32),
    )(x3, x4))

    return 0


if __name__ == "__main__":
    main()

def main2():
    x4 = jnp.ones((SB, N, 8, SEG), jnp.float32)   # NT=8
    n1 = jnp.ones((SB, N, 8, 1), jnp.float32)

    # a. sublane roll of a narrow (...,NT,1) tensor
    def ka(b_ref, o_ref):
        o_ref[...] = b_ref[...] + pltpu.roll(b_ref[...] * 2.0, 1, axis=2)

    run("roll (SB,N,NT,1) axis=2", lambda: pl.pallas_call(
        ka, out_shape=jax.ShapeDtypeStruct((SB, N, 8, 1), jnp.float32))(n1))

    # b. lane slice width-1 of a 4-D tensor
    def kb(b_ref, o_ref):
        o_ref[...] = b_ref[..., SEG - 1 : SEG] * 2.0

    run("lane slice 4D -> (SB,N,NT,1)", lambda: pl.pallas_call(
        kb, out_shape=jax.ShapeDtypeStruct((SB, N, 8, 1), jnp.float32))(x4))

    # c. sublane roll of the FULL 4-D tensor
    def kc(b_ref, o_ref):
        o_ref[...] = b_ref[...] + pltpu.roll(b_ref[...] * 2.0, 1, axis=2)

    run("roll (SB,N,NT,SEG) axis=2", lambda: pl.pallas_call(
        kc, out_shape=jax.ShapeDtypeStruct((SB, N, 8, SEG), jnp.float32))(x4))

    # d. sum-reduce narrow tensor over sublane axis
    def kd(b_ref, o_ref, h_ref):
        h_ref[...] = jnp.sum(b_ref[..., 0:1], axis=2, keepdims=True)
        o_ref[...] = b_ref[...] * h_ref[...]

    run("reduce (SB,N,NT,1)->(SB,N,1,1)", lambda: pl.pallas_call(
        kd, out_shape=jax.ShapeDtypeStruct((SB, N, 8, SEG), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SB, N, 1, 1), jnp.float32)])(x4))

    # e. batched dot: (NT as batch) (NT,R,SEG)x(NT,D,SEG) -> (NT,R,D)
    R, D = 48, 128
    c = jnp.ones((8, R, SEG), jnp.bfloat16)
    d = jnp.ones((8, D, SEG), jnp.bfloat16)

    def ke(c_ref, d_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            c_ref[...], d_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run("batched dot (NT,R,S)x(NT,D,S)", lambda: pl.pallas_call(
        ke, out_shape=jax.ShapeDtypeStruct((8, R, D), jnp.float32))(c, d))

    # f. iota + where + broadcast-mult of (SB,N,1,1) scratch against 4-D
    def kf(b_ref, o_ref, h_ref):
        h_ref[...] = jnp.sum(b_ref[..., 0:1], axis=2, keepdims=True)
        scol = jax.lax.broadcasted_iota(jnp.int32, (SB, N, 8, SEG), 2)
        o_ref[...] = jnp.where(scol == 0, h_ref[...] * 3.0, b_ref[...])

    run("where(scol, (SB,N,1,1), 4D)", lambda: pl.pallas_call(
        kf, out_shape=jax.ShapeDtypeStruct((SB, N, 8, SEG), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SB, N, 1, 1), jnp.float32)])(x4))

    return 0


if __name__ == "__main__":
    main2()
