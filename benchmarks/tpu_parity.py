"""Hardware parity check: run the Pallas kernels on the REAL TPU and assert
against their pure-jnp references.

The CI suite runs the kernels in interpret mode on CPU (tests/), which
validates the math but not Mosaic's lowering (lane gathers, pltpu.repeat,
roll semantics, dot layouts). This script re-asserts values AND gradients on
hardware. Run whenever a kernel changes:

    python benchmarks/tpu_parity.py          # ~2 min incl. compiles
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

FAILED = []


def check(name, got, want, rtol, atol, mask=None):
    """Hardware tolerance note: on TPU both the kernel and the XLA reference
    run f32 matmuls at DEFAULT precision (one bf16 pass), so two different
    contraction orders legitimately differ at the ~3e-3 level (measured:
    ref-on-TPU vs ref-on-CPU dyc/dkernel rel-err 3.4e-3 at stage-1 size).
    Interpret-mode CI (tests/test_tap_conv.py) pins the exact math at 1e-5.
    `mask` drops positions excluded from comparison (subgradient ties)."""
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    if mask is not None:
        got, want = got * mask, want * mask
    scale = np.abs(want).max() + 1e-9
    err = np.abs(got - want).max() / scale
    ok = err <= rtol + atol
    print(f"  {name:28s} rel-err {err:9.2e}  {'ok' if ok else 'FAIL'}")
    if not ok:
        FAILED.append(name)


def tap_conv_parity():
    from mm_unet_tpu.ops.tap_conv import tap_conv
    from tests.test_tap_conv import _make, _ref

    print("tap_conv (gather kernel) on TPU:")
    for dims in ((2, 16, 16, 8, 8, 3), (2, 256, 256, 64, 16, 3),
                 (1, 32, 64, 16, 8, 9)):
        B, H, W, C, F, k = dims
        feat, yc, kernel, bias, shifts = _make(B, H, W, C, F, k, seed=11)
        got = tap_conv(feat, yc, kernel, bias, shifts, interpret=False)
        want = _ref(feat, yc, kernel, bias, shifts)
        check(f"fwd f32 {dims}", got, want, 1e-2, 1e-3)

        w = jnp.asarray(
            np.random.default_rng(5).standard_normal((B, H, W, F)), jnp.float32)
        gp = jax.grad(
            lambda *a: jnp.sum(tap_conv(*a, shifts, interpret=False) * w),
            argnums=(0, 1, 2, 3))(feat, yc, kernel, bias)
        gr = jax.grad(lambda *a: jnp.sum(_ref(*a, shifts) * w),
                      argnums=(0, 1, 2, 3))(feat, yc, kernel, bias)
        # exact-integer coordinates are subgradient ties: the lerp slope
        # (hi - lo) and the hat autodiff both return VALID subgradients that
        # differ there (measure-zero; observed once in 39M random draws)
        ycn = np.asarray(jnp.clip(yc, 0, H - 1))
        tie = (np.abs(ycn - np.round(ycn)) > 1e-5).astype(np.float32)
        for nm, a, b in zip(("dfeat", "dyc", "dkernel", "dbias"), gp, gr):
            check(f"{nm} {dims}", a, b, 1e-2, 1e-3,
                  mask=tie if nm == "dyc" else None)

    B, H, W, C, F, k = 2, 256, 256, 64, 16, 3
    feat, yc, kernel, bias, shifts = _make(B, H, W, C, F, k, seed=3)
    got = tap_conv(feat.astype(jnp.bfloat16), yc, kernel, bias, shifts,
                   interpret=False)
    want = _ref(feat.astype(jnp.bfloat16), yc, kernel, bias, shifts)
    check("fwd bf16 streams", got, want, 3e-2, 3e-3)


def mega_parity():
    from tests.test_mamba_fused import _make, _ref_path
    from mm_unet_tpu.ops.mamba_fused import mamba_fused_scan

    print("mamba megakernel on TPU:")
    for D, L, G, rev in ((48, 1536, 2, False), (48, 1536, 1, True),
                         (8, 4096, 2, False), (128, 2048, 1, False)):
        args = _make(D, L, G, seed=9)
        got = mamba_fused_scan(*args, reverse=rev, interpret=False)
        want = _ref_path(*args, reverse=rev)
        check(f"fwd D{D} L{L} G{G} rev={rev}", got, want, 3e-3, 3e-4)

        w = jnp.asarray(np.random.default_rng(2).standard_normal(got.shape),
                        jnp.float32)
        gm = jax.grad(
            lambda *a: jnp.sum(
                mamba_fused_scan(*a, reverse=rev, interpret=False)
                .astype(jnp.float32) * w),
            argnums=(0, 3, 6))(*args)
        gr = jax.grad(
            lambda *a: jnp.sum(_ref_path(*a, reverse=rev) * w),
            argnums=(0, 3, 6))(*args)
        for nm, a, b in zip(("dxz", "dx_proj", "dA"), gm, gr):
            check(f"{nm} D{D} L{L} G{G} rev={rev}", a, b, 8e-3, 8e-4)


def main() -> int:
    assert any(d.platform == "tpu" for d in jax.devices()), "needs the TPU"
    tap_conv_parity()
    mega_parity()
    if FAILED:
        print("FAILED:", FAILED)
        return 1
    print("all hardware parity checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
