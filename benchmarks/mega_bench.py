"""Microbenchmark the fused Mamba megakernel at production shapes.

RCG2 (the dominant scan: 36% of the train step): B=8, D=128, L=65536,
G=2 forward-domain directions + 1 reversed, R=4, N=16.

    python benchmarks/mega_bench.py [fwd|bwd|all]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(f, args, n=6):
    """Chained-call timing with float() sync (block_until_ready does not
    reliably block through the axon tunnel — see components.bench_chain)."""

    def chain(m):
        def g(*a):
            s = 0.0
            first = a[0]
            for _ in range(m):
                out = f(first, *a[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                s = s + jnp.sum(leaf)
                first = first + (s * 1e-20).astype(first.dtype)
            return s
        return jax.jit(g)

    f1, fn = chain(1), chain(n + 1)
    float(f1(*args)); float(fn(*args))
    t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(*args)); tn = time.perf_counter() - t0
    return (tn - t1) / n * 1e3


def main(which: str = "all") -> int:
    from mm_unet_tpu.ops.mamba_fused import mamba_fused_scan

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731

    only = os.environ.get("MMU_BENCH_ONLY", "")
    for tag, B, D, L, G, rev in [
        ("RCG2 G2fwd", 8, 128, 65536, 2, False),
        ("RCG2 G1rev", 8, 128, 65536, 1, True),
        ("RCG3 G2fwd", 8, 128, 16384, 2, False),
        # MMConv-shaped small-channel scan (d_model=3 -> d_inner=6 -> Dp=8);
        # sideout2 scale (256^2 tokens)
        ("MMC6 G2fwd", 8, 6, 65536, 2, False),
    ]:
        if only and only not in tag:
            continue
        N, R, W = 16, max(1, 64 // 16), 4
        xz = jnp.concatenate(
            [(f(B, G, D, L) * 0.5).astype(jnp.bfloat16),
             f(B, G, D, L).astype(jnp.bfloat16)], axis=2,
        )
        args = (
            xz,
            f(G, D, W) * 0.3, f(G, D) * 0.1,
            f(G, R + 2 * N, D) * (D ** -0.5),
            f(G, D, R) * 0.3, f(G, D) * 0.1,
            -jnp.exp(f(G, D, N) * 0.5), f(G, D),
        )
        if which in ("fwd", "all"):
            fwd = jax.jit(lambda *a: mamba_fused_scan(*a, reverse=rev))
            print(f"{tag} fwd:  {timeit(fwd, args):7.2f} ms")
        if which in ("bwd", "all"):
            def loss(*a):
                return jnp.sum(mamba_fused_scan(*a, reverse=rev) * 1e-3)

            vjp = jax.jit(jax.grad(loss, argnums=tuple(range(8))))
            print(f"{tag} f+b:  {timeit(vjp, args):7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
