"""REJECTED prototype: interleaved recompute+adjoint window-decay scans.

Idea: the backward kernels run TWO window scans over the same dt/A2 — the
prefix recompute of h (from b_folded) and the suffix adjoint of g (from
ginit).  The adjoint's window sums vs_s[t] = sum_{t+1..t+s} dt equal the
prefix windows at a shifted position, ws_s[t+s], BIT-for-bit (float addition
commutes and both doublings sum the same pairs), and every rolled wrap
position lands in the prefix decay tile's masked-zero region — so the
adjoint's per-pass decay tile is exactly `roll(Ds, T-s)` of the recompute's,
and the second full-size broadcast-multiply + exp2 per pass can be replaced
by one full-size roll.  `pair_parity()` below proves the bit-exactness.

Measured on v5e (benchmarks/mega_bench.py, 2026-08, packed-xz megakernel):

                      separate scans    interleaved (this proto)
    RCG2 G2fwd  f+b      128.7 ms            172.5 ms   (+34%)
    RCG2 G1rev  f+b       66.5 ms             88.0 ms   (+32%)
    RCG3 G2fwd  f+b       32.2 ms             43.4 ms
    MMC6 G2fwd  f+b        9.5 ms             10.7 ms

REJECTED: the full-size `pltpu.roll` of the (SB, N, T) decay tile costs more
than the broadcast-multiply + exp2 it saves (consistent with the r3
ablations: rolls are ~half the kernel's streaming cost, exp2 is nearly free),
and interleaving doubles the live full-size tiles per pass (b, g, Ds and two
rolled copies), hurting Mosaic's vreg scheduling.  Keep the separate
`_window_scan_fwd` / `_window_scan_rev` pair in the production kernels.

Run:  python benchmarks/pair_scan_proto.py   (asserts bitwise parity on CPU)
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm_unet_tpu.ops.pallas_scan import (  # noqa: E402
    _BIG,
    _window_scan_fwd,
    _window_scan_rev,
)

Array = jax.Array


def window_scan_fwd_adj(dt: Array, A2: Array, b: Array, g: Array) -> tuple[Array, Array]:
    """Interleaved prefix recompute + adjoint suffix scan, one shared decay
    tile per pass.  Returns (h, g) bit-identical to
    (_window_scan_fwd(dt, A2, b), _window_scan_rev(dt, A2, g))."""
    T = b.shape[2]
    col2 = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    ws = dt
    s = 1
    while s < T:
        wm = jnp.where(col2 >= s, ws, _BIG)
        Ds = jnp.exp2(wm[:, None, :] * A2[:, :, None])
        b = Ds * pltpu.roll(b, s, axis=2) + b
        g = g + pltpu.roll(Ds, T - s, axis=2) * pltpu.roll(g, T - s, axis=2)
        if s * 2 < T:
            ws = ws + pltpu.roll(ws, s, axis=1)
        s *= 2
    return b, g


def window_scan_rev_adj(dt: Array, A2: Array, b: Array, g: Array) -> tuple[Array, Array]:
    """Reverse-direction twin: suffix recompute + adjoint lagged-prefix scan.
    ps_s[t] = sum_{t-s..t-1} dt = us_s[t-s], so the adjoint decay tile is
    roll(Ds, s) with wraps landing in Ds's masked region."""
    T = b.shape[2]
    col2 = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    us = dt
    s = 1
    while s < T:
        wm = jnp.where(col2 < T - s, us, _BIG)
        Ds = jnp.exp2(wm[:, None, :] * A2[:, :, None])
        b = Ds * pltpu.roll(b, T - s, axis=2) + b
        g = g + pltpu.roll(Ds, s, axis=2) * pltpu.roll(g, s, axis=2)
        if s * 2 < T:
            us = us + pltpu.roll(us, T - s, axis=1)
        s *= 2
    return b, g


def pair_parity() -> None:
    """Assert bitwise equality of the interleaved scans vs the production
    separate scans, in interpret mode (runs anywhere)."""
    D, N, T = 8, 8, 128
    key = jax.random.key(0)
    dt = jax.random.uniform(key, (D, T), jnp.float32, minval=0.01, maxval=0.5)
    A2 = -jax.random.uniform(
        jax.random.fold_in(key, 1), (D, N), jnp.float32, minval=0.1, maxval=2.0
    )
    b = jax.random.normal(jax.random.fold_in(key, 2), (D, N, T), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 3), (D, N, T), jnp.float32)

    def run(fn):
        def kernel(dt_ref, A_ref, b_ref, g_ref, h_ref, go_ref):
            h_ref[...], go_ref[...] = fn(dt_ref[...], A_ref[...], b_ref[...], g_ref[...])

        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((D, N, T), jnp.float32)] * 2,
            interpret=True,
        )(dt, A2, b, g)

    def run_sep(scan, adj):
        return run(lambda d, a, bb, gg: (scan(d, a, bb), adj(d, a, gg)))

    h1, g1 = run(window_scan_fwd_adj)
    h0, g0 = run_sep(_window_scan_fwd, _window_scan_rev)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))

    # Reverse direction vs the fused-module scans (same identities).
    from mm_unet_tpu.ops.mamba_fused import _wscan_adj_of_rev, _wscan_rev

    h1, g1 = run(window_scan_rev_adj)
    h0, g0 = run_sep(_wscan_rev, _wscan_adj_of_rev)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
    print("pair-scan bitwise parity: OK (both directions)")


if __name__ == "__main__":
    # The axon TPU plugin ignores JAX_PLATFORMS from the environment; force
    # CPU through the config API (interpret-mode kernels through the TPU
    # tunnel are pathologically slow).
    jax.config.update("jax_platforms", "cpu")
    pair_parity()
