"""Reduced-precision (bf16) inference parity.

The bf16 predictor (`make_predictor(state, dtype=jnp.bfloat16)`) casts the
feature/weight path to bf16 while geometry-critical math stays f32
(`_TapConv` hat weights, `grid_sample` coordinates). These tests pin that
contract: bf16 and f32 inference must agree to activation-noise level, both
through the raw predictor and through the jitted sliding-window pipeline.
Reference context: inference entry `/root/reference/train.py:90,180-181`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture compiles full MM_Net predictors (~85 s cold)

from mm_unet_tpu.models.mm_unet import MM_Net
from mm_unet_tpu.train.inferers import SlidingWindowInferer
from mm_unet_tpu.train.trainer import create_train_state, make_predictor
from mm_unet_tpu.utils.config import ConfigDict


@pytest.fixture(scope="module")
def small_state():
    config = ConfigDict(
        trainer=dict(lr=1e-3, warmup=2, num_epochs=10, weight_decay=0.05,
                     steps_per_epoch=2, optimizer="adamw")
    )
    # mamba_dtype=None -> pure-f32 model, so p32 below is a true f32 anchor
    # (the model DEFAULT is bf16 compute; here we pin the cast-predictor
    # against full precision)
    model = MM_Net(num_classes=1, num_slices_list=(4, 4, 2, 2), remat=False,
                   depths=(1, 1, 1, 1), mamba_dtype=None)
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 3, 64, 64))
    return create_train_state(model, config, rng, x), x


def test_predictor_bf16_close_to_f32(small_state):
    state, x = small_state
    p32 = make_predictor(state)
    p16 = make_predictor(state, dtype=jnp.bfloat16)
    assert p16.cast_dtype == jnp.bfloat16
    o32 = np.asarray(p32(x))
    o16 = np.asarray(p16(x))
    assert o16.dtype == np.float32  # cast back on the way out
    s32 = 1.0 / (1.0 + np.exp(-o32))
    s16 = 1.0 / (1.0 + np.exp(-o16))
    # activation-noise level agreement on probabilities
    assert float(np.mean(np.abs(s32 - s16))) < 0.02
    agree = float(np.mean((s32 > 0.5) == (s16 > 0.5)))
    assert agree > 0.98


def test_sliding_window_bf16_pipeline(small_state):
    state, _ = small_state
    rng = jax.random.key(7)
    img = jax.random.normal(rng, (1, 3, 96, 96))  # multi-window at roi 64
    inferer = SlidingWindowInferer(roi_size=(64, 64), overlap=0.5)
    o32 = np.asarray(inferer(img, make_predictor(state)))
    o16 = np.asarray(inferer(img, make_predictor(state, dtype=jnp.bfloat16)))
    assert o16.dtype == np.float32
    s32 = 1.0 / (1.0 + np.exp(-o32))
    s16 = 1.0 / (1.0 + np.exp(-o16))
    assert float(np.mean(np.abs(s32 - s16))) < 0.02
    assert float(np.mean((s32 > 0.5) == (s16 > 0.5))) > 0.98
