"""Component-level TPU timing harness (reproducible across rounds).

Times the hot ops at bench-relevant shapes: selective-scan kernel (MMConv- and
RCG-shaped), deformable sampling variants, and a full MMConv/RCG module
forward+backward. Run on the real chip: `python benchmarks/components.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")


def bench_chain(f, args, n=6):
    """Amortised steady-state ms/call: chains n calls inside one jit with a
    TRUE data dependency between iterations (a zero-multiply feedback gets
    CSE'd by XLA and measures a single call), and subtracts a 1-call run to
    remove the tunnel round-trip."""

    def make(m):
        def chain(x, *rest):
            s = 0.0
            xx = x
            for _ in range(m):
                o = f(xx, *rest)
                s = s + jnp.sum(o)
                xx = xx + jnp.reshape(s, (1,) * x.ndim) * 1e-12
            return s
        return chain

    f1 = jax.jit(make(1))
    fn = jax.jit(make(n))
    float(f1(*args)); float(fn(*args))
    t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(*args)); tn = time.perf_counter() - t0
    return (tn - t1) / (n - 1) * 1e3


def main():
    rng = np.random.default_rng(0)
    from mm_unet_tpu.ops.pallas_scan import selective_scan_pallas

    print("== selective scan (fwd) ==")
    for B, D, L, N, G, tag in [
        (4, 18, 16384, 16, 3, "MMConv-s2@512 (fused dirs)"),
        (4, 384, 65536, 16, 3, "RCG2@512 (fused dirs)"),
    ]:
        u = jnp.asarray(rng.standard_normal((B, D, L)), jnp.float32)
        dt = jnp.asarray(0.5 * rng.standard_normal((B, D, L)), jnp.float32)
        A = jnp.asarray(-np.exp(rng.standard_normal((D, N)) * 0.5), jnp.float32)
        Bv = jnp.asarray(rng.standard_normal((B, G, N, L)), jnp.float32)
        Cv = jnp.asarray(rng.standard_normal((B, G, N, L)), jnp.float32)
        t = bench_chain(lambda u_, dt_: selective_scan_pallas(u_, dt_, A, Bv, Cv, delta_softplus=True), (u, dt))
        print(f"  {tag}: {t:.2f} ms")

    print("== deform sampling (fwd+bwd) ==")
    from mm_unet_tpu.models.layers import deform_sample_rows, deform_sample_rows_matmul

    for B, H, W, C, k, tag in [(4, 128, 128, 64, 3, "stage2")]:
        feat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        y = jnp.asarray(rng.uniform(-2, H + 2, (B, H, W, k)), jnp.float32)
        sh = [j - k // 2 for j in range(k)]
        for name, fn in (("gather", deform_sample_rows), ("matmul", deform_sample_rows_matmul)):
            g = jax.grad(lambda f_, y_: jnp.sum(jnp.sin(fn(f_, y_, sh))))
            t = bench_chain(g, (feat, y))
            print(f"  {tag} {name} bwd: {t:.2f} ms")


if __name__ == "__main__":
    main()
