"""Capture a profiler trace of the bench train step (512², batch 8) and
print the op-category breakdown. Run on the real chip:

    python benchmarks/profile_step.py [logdir]
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python benchmarks/parse_trace.py /tmp/mmu_trace
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


def main(logdir: str = "/tmp/mmu_trace") -> int:
    from mm_unet_tpu.models.mm_unet import MM_Net
    from mm_unet_tpu.train.trainer import create_train_state, make_loss_fn, train_step

    from mm_unet_tpu.utils.config import ConfigDict

    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=2, num_epochs=3000, weight_decay=0.05,
                     steps_per_epoch=10, optimizer="adamw")
    )
    model = MM_Net(num_classes=1, remat=os.environ.get("MMU_REMAT", "1") == "1")
    rng = jax.random.key(0)
    B, S = 8, 512
    x = jax.random.normal(jax.random.fold_in(rng, 1), (B, 3, S, S), jnp.float32)
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (B, 1, S, S)) > 0.9).astype(jnp.float32)
    state = create_train_state(model, config, rng, x)
    loss_fn = make_loss_fn({"dice_focal_loss": {}}, {"dice_focal_loss": 1.0})

    for _ in range(2):
        state, scalars, _ = train_step(state, x, y, rng, loss_fn)
        _ = float(scalars["total_loss"])

    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, scalars, _ = train_step(state, x, y, rng, loss_fn)
        _ = float(scalars["total_loss"])
    dt = (time.perf_counter() - t0) / 3
    print(f"step {dt*1e3:.1f} ms -> {B/dt:.2f} img/s; trace in {logdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
