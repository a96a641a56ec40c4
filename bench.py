"""Benchmark: MM_Net training + sliding-window inference throughput,
DRIVE-shaped 512x512, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"infer_images_per_sec", "train_mfu", "train_flops_per_step"}. The primary
metric/value stay the train img/s so rounds compare like-for-like; infer is
measured through the real jitted sliding-window pipeline (BASELINE.md names
"train and sliding-window infer"), and MFU = achieved FLOP/s over the v5e
peak (197e12 bf16) using the jit cost analysis of the train step.

`vs_baseline` is value / REFERENCE_A100_IMG_PER_SEC. The reference repo
publishes no numbers (BASELINE.md), so the denominator is an estimate of the
reference PyTorch pipeline's A100 training throughput at 512^2 derived from
its configuration (batch 5, MM-UNet with ~19 MMConv deformable convs + 4
Mamba-v3 detours per step); it is recorded here so the ratio is reproducible
and can be replaced by a measured number when one exists.
"""

from __future__ import annotations

import json
import sys
import time

import os

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

REFERENCE_A100_IMG_PER_SEC = 12.0  # estimated reference A100 train throughput
V5E_PEAK_FLOPS = 197e12  # bf16 peak, TPU v5e datasheet

BATCH = 8  # best measured operating point (sweep: b4 13.0, b8 14.1, b16 OOM)
SIZE = 512
WARMUP_STEPS = 2
MEASURE_STEPS = 8
INFER_STEPS = 8


def main() -> int:
    from mm_unet_tpu.models.mm_unet import MM_Net
    from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
    from mm_unet_tpu.utils.config import ConfigDict

    config = ConfigDict(
        trainer=dict(
            lr=1e-3, warmup=2, num_epochs=3000, weight_decay=0.05,
            steps_per_epoch=10, optimizer="adamw",
        )
    )
    # Operating point (round 3): bf16 compute (model default) shrinks the
    # live activation set enough that batch 8 @ 512² fits WITHOUT remat —
    # skipping the MMConv recompute in backward is worth ~2.5% step time.
    # remat=True stays the model default (needed for large-image protocols,
    # e.g. STARE 704²/896²).
    model = MM_Net(num_classes=1, remat=False)
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (BATCH, 3, SIZE, SIZE), jnp.float32)
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (BATCH, 1, SIZE, SIZE)) > 0.9).astype(
        jnp.float32
    )

    state = create_train_state(model, config, rng, x)
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})

    for _ in range(WARMUP_STEPS):
        state, scalars, _ = train_step(state, x, y, rng, loss_fn)
        _ = float(scalars["total_loss"])  # force full sync

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, scalars, _ = train_step(state, x, y, rng, loss_fn)
    _ = float(scalars["total_loss"])  # sync once at the end (steps chain on device)
    dt = (time.perf_counter() - t0) / MEASURE_STEPS
    img_per_sec = BATCH / dt

    # Step-category breakdown from a profiler trace (VERDICT r2 item 5: make
    # "near the hardware limit" checkable). 2 traced steps -> per-step ms by
    # HLO category via benchmarks.parse_trace.categorize.
    breakdown = scan_ms = None
    try:
        import jax.profiler as _prof

        tracedir = "/tmp/mmu_bench_trace"
        with _prof.trace(tracedir):
            for _ in range(2):
                state, scalars, _ = train_step(state, x, y, rng, loss_fn)
            _ = float(scalars["total_loss"])
        # parse in a subprocess: the pure-python protobuf env var must be set
        # before protobuf's first import, which jax has already done here
        import subprocess

        env = dict(os.environ, PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python",
                   JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "parse_trace.py"),
             tracedir, "--json"],
            env=env, capture_output=True, text=True, timeout=300,
        )
        kinds = json.loads(out.stdout.strip().splitlines()[-1])
        tot = sum(kinds.values())
        breakdown = {k: round(100 * v / tot, 1) for k, v in kinds.items()}
        scan_ms = round(kinds.get("pallas_scan", 0.0) / 2, 1)  # per step
    except Exception:
        pass

    # train-step FLOPs from the compiled cost analysis -> MFU
    try:
        loss_struct = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
        lowered = jax.jit(
            train_step, static_argnames=("loss_fn", "has_batch_stats")
        ).lower(state, x, y, rng, loss_struct)
        cost = lowered.compile().cost_analysis()
        flops = float(cost.get("flops", float("nan"))) if cost else float("nan")
    except Exception:
        flops = float("nan")
    mfu = flops / dt / V5E_PEAK_FLOPS if flops == flops else float("nan")

    # sliding-window inference throughput through the real jitted pipeline
    from mm_unet_tpu.train.inferers import SlidingWindowInferer
    from mm_unet_tpu.train.trainer import make_predictor

    inferer = SlidingWindowInferer(roi_size=(SIZE, SIZE), overlap=0.5)

    def time_infer(predictor):
        out = inferer(x, predictor)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(INFER_STEPS):
            out = inferer(x, predictor)
        jax.block_until_ready(out)
        return BATCH * INFER_STEPS / (time.perf_counter() - t0)

    infer_per_sec = time_infer(make_predictor(state))
    # reduced-precision inference (geometry stays f32 in-model; parity pinned
    # by tests/test_infer_bf16.py)
    try:
        infer_bf16_per_sec = time_infer(make_predictor(state, dtype=jnp.bfloat16))
    except Exception:
        infer_bf16_per_sec = None

    print(
        json.dumps(
            {
                "metric": "mmnet_train_512_images_per_sec_per_chip",
                "value": round(img_per_sec, 3),
                "unit": "images/sec",
                "vs_baseline": round(img_per_sec / REFERENCE_A100_IMG_PER_SEC, 3),
                "infer_images_per_sec": round(infer_per_sec, 3),
                "infer_bf16_images_per_sec": (
                    round(infer_bf16_per_sec, 3) if infer_bf16_per_sec else None
                ),
                "train_mfu": round(mfu, 4) if mfu == mfu else None,
                "train_flops_per_step": flops if flops == flops else None,
                # Honest roofline (MXU-MFU is the wrong denominator for a
                # VPU-bound Mamba-1 scan): live per-step device-time shares by
                # HLO category, the scan ms/step, and the scan kernel's
                # measured distance to its own ablation floor. The floor
                # numbers are from benchmarks/components.py ablations at the
                # dominant RCG2 single-direction scale (B8 D128 N16 L65536):
                # whole kernel 17.1 ms, arith-only (rolls removed) 15.9 ms,
                # rolls-only (arith removed) 8.6 ms — i.e. the kernel runs at
                # ~93% of its arithmetic-stream floor; it is NOT roll-bound
                # since the round-2 window-decay rewrite removed the a-stream.
                "step_breakdown_pct": breakdown,
                "scan_ms_per_step": scan_ms,
                "scan_kernel_util_vs_arith_floor": 0.93,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
