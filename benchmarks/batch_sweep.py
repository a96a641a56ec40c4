"""Train-step throughput at several batch sizes (the megakernel + bf16
streams freed HBM in rounds 2-3; re-probe the operating point).

    python benchmarks/batch_sweep.py [batch ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

SIZE = 512


def bench_batch(batch: int) -> float:
    from mm_unet_tpu.models.mm_unet import MM_Net
    from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step
    from mm_unet_tpu.utils.config import ConfigDict

    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=2, num_epochs=3000, weight_decay=0.05,
                     steps_per_epoch=10, optimizer="adamw")
    )
    # MMU_SWEEP_REMAT=0 probes the no-recompute profile (bench.py's operating
    # point); default True matches large-image protocols
    model = MM_Net(num_classes=1,
                   remat=os.environ.get("MMU_SWEEP_REMAT", "1") != "0")
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 3, SIZE, SIZE), jnp.float32)
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (batch, 1, SIZE, SIZE)) > 0.9).astype(jnp.float32)
    state = create_train_state(model, config, rng, x)
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})
    for _ in range(2):
        state, scalars, _ = train_step(state, x, y, rng, loss_fn)
        _ = float(scalars["total_loss"])
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        state, scalars, _ = train_step(state, x, y, rng, loss_fn)
    _ = float(scalars["total_loss"])
    return batch / ((time.perf_counter() - t0) / n)


def main(*batches):
    batches = [int(b) for b in batches] or [12, 16]
    for b in batches:
        try:
            r = bench_batch(b)
            print(f"batch {b}: {r:6.2f} img/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"batch {b}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
