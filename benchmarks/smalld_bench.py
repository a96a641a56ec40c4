"""Microbench: small-Dp megakernel launches (the MMConv TFM Mamba shapes,
d_model=k -> d_inner 6/8, Dp=8) under a chunk-length (T) sweep.

Round-3 trace: Dp=8 launches total ~61 ms/step (vs ~250 ms for Dp=128) while
carrying 16x fewer state-elements — ~10x worse per-element cost, i.e. they
are grid-step-overhead bound. Usage:

    python benchmarks/smalld_bench.py            # T sweep at the trace shapes
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from mega_bench import timeit  # chained-call timing with float() sync


def main() -> int:
    from mm_unet_tpu.ops.mamba_fused import mamba_fused_scan

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731

    B, D, N, W = 8, 8, 16, 4
    R = 8  # rBp after padding; real R=1
    for G, L in ((2, 65536), (1, 65536), (2, 16384), (1, 16384), (2, 4096)):
        xz = jnp.concatenate(
            [(f(B, G, D, L) * 0.5).astype(jnp.bfloat16),
             f(B, G, D, L).astype(jnp.bfloat16)], axis=2)
        args = (
            xz, f(G, D, W) * 0.3, f(G, D) * 0.1,
            f(G, R + 2 * N, D) * (D ** -0.5),
            f(G, D, R) * 0.3, f(G, D) * 0.1,
            -jnp.exp(f(G, D, N) * 0.5), f(G, D),
        )
        for T in (1024, 2048, 4096):
            if T > L:
                continue
            os.environ["MMU_MEGA_T_SMALL"] = str(T)
            t_f = timeit(lambda *a: mamba_fused_scan(*a), args)

            def loss(*a):
                return jnp.sum(mamba_fused_scan(*a).astype(jnp.float32) * 1e-3)

            vjp = jax.grad(loss, argnums=tuple(range(8)))
            t_b = timeit(vjp, args)
            print(f"G{G} L{L:6d} T{T:5d}:  fwd {t_f:6.2f} ms   f+b {t_b:7.2f} ms",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
