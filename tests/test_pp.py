"""Pipeline parallelism: the GPipe stage loop must reproduce the sequential
stack exactly — values and gradients.

The reference has no pipeline parallelism (SURVEY.md §2.7 — DDP only);
`parallel/pp.py` is the TPU-native extension: stage-sharded stacked layer
parameters + a `lax.scan` tick loop with `ppermute` ring hops inside one
jitted SPMD program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.models.lm import MixerModel
from mm_unet_tpu.parallel import make_mesh, mixer_pipeline_forward
from mm_unet_tpu.parallel.pp import (
    make_stage_fn,
    pipeline_apply,
    stack_layer_params,
)

D_MODEL, N_LAYER, VOCAB, L = 16, 4, 32, 8


def _model_and_inputs(batch=4, seed=0, n_layer=N_LAYER):
    model = MixerModel(d_model=D_MODEL, n_layer=n_layer, vocab_size=VOCAB,
                       d_state=4)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, VOCAB, (batch, L)), jnp.int32)
    variables = model.init(jax.random.key(0), ids)
    return model, variables, ids


@pytest.mark.slow
@pytest.mark.parametrize("stages,microbatches", [(4, 2), (4, 1), (2, 4), (8, 4)])
def test_pipeline_matches_sequential(stages, microbatches):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("stage",), devices=jax.devices()[:stages])
    model, variables, ids = _model_and_inputs(n_layer=max(N_LAYER, stages))
    want = model.apply(variables, ids)
    got = mixer_pipeline_forward(
        model, variables, ids, mesh=mesh, num_microbatches=microbatches
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pipeline_grads_match_sequential():
    """jax.grad through the stage loop (ppermute/psum transposes) must equal
    the sequential gradients for EVERY parameter, including the stage-sharded
    layer groups and the replicated embedding."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("stage",), devices=jax.devices()[:4])
    model, variables, ids = _model_and_inputs()
    w = jnp.cos(jnp.arange(ids.shape[0] * L * D_MODEL, dtype=jnp.float32)
                ).reshape(ids.shape[0], L, D_MODEL)

    def loss_seq(v):
        return jnp.sum(model.apply(v, ids) * w)

    def loss_pp(v):
        out = mixer_pipeline_forward(model, v, ids, mesh=mesh,
                                     num_microbatches=2)
        return jnp.sum(out * w)

    g_seq = jax.grad(loss_seq)(variables)
    g_pp = jax.jit(jax.grad(loss_pp))(variables)
    flat_seq, tree_seq = jax.tree_util.tree_flatten(g_seq)
    flat_pp, tree_pp = jax.tree_util.tree_flatten(g_pp)
    assert tree_seq == tree_pp
    for a, b in zip(flat_seq, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_composes_with_data_parallel():
    """('data', 'stage') mesh: each stage pipeline runs on its own batch
    shard; the result still equals the sequential forward on the full batch."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("data", "stage"), shape=(2, 4), devices=jax.devices()[:8])
    model, variables, ids = _model_and_inputs(batch=4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data")))
    want = model.apply(variables, ids)
    got = mixer_pipeline_forward(
        model, variables, ids_sh, mesh=mesh, num_microbatches=2,
        batch_spec=P("data"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_apply_generic_block():
    """pipeline_apply on a plain (non-flax) uniform block: y = W_l @ x + b_l
    chained over 8 layers on 4 stages, vs the sequential loop."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("stage",), devices=jax.devices()[:4])
    rng = np.random.default_rng(1)
    n_layer, d, batch = 8, 6, 6
    Ws = [jnp.asarray(rng.standard_normal((d, d)) * 0.3, jnp.float32)
          for _ in range(n_layer)]
    bs = [jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
          for _ in range(n_layer)]
    x = jnp.asarray(rng.standard_normal((batch, d)), jnp.float32)

    want = x
    for W, b in zip(Ws, bs):
        want = jnp.tanh(want @ W.T + b)

    stacked = stack_layer_params([{"W": W, "b": b} for W, b in zip(Ws, bs)])
    stage_fn = make_stage_fn(lambda p, h: jnp.tanh(h @ p["W"].T + p["b"]))
    got = pipeline_apply(stage_fn, stacked, x, mesh=mesh, num_microbatches=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_validates_inputs():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("stage",), devices=jax.devices()[:4])
    stacked = {"W": jnp.zeros((6, 2, 2))}  # 6 layers % 4 stages != 0
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(lambda p, x: x, stacked, jnp.zeros((4, 2)),
                       mesh=mesh, num_microbatches=2)
