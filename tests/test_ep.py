"""Expert-parallel Switch MoE layer: routing semantics and EP-sharded
numerical parity vs the single-device layer.

The reference has no MoE (SURVEY.md §2.7); `parallel/ep.py` is the TPU-native
extension completing the parallelism matrix (dp/tp/zero/sp/pp/ep).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.parallel import make_mesh
from mm_unet_tpu.parallel.ep import SwitchFFN, ep_param_specs, shard_moe_params

D, FF, E = 8, 16, 8


def _layer_and_inputs(batch=2, L=32, capacity_factor=1.25, seed=0):
    layer = SwitchFFN(d_model=D, d_ff=FF, n_experts=E,
                      capacity_factor=capacity_factor)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, L, D)), jnp.float32)
    variables = layer.init(jax.random.key(0), x)
    return layer, variables, x


def test_moe_forward_shapes_and_aux():
    layer, variables, x = _layer_and_inputs()
    y, aux = layer.apply(variables, x)
    assert y.shape == x.shape
    # Switch aux estimator is 1.0 at perfect balance, E at full collapse.
    assert 0.5 <= float(aux) <= E


def test_moe_capacity_overflow_falls_through():
    """Force every token to expert 0 with tiny capacity: kept tokens get the
    expert MLP added; overflow tokens pass through on the residual exactly."""
    layer, variables, x = _layer_and_inputs(batch=1, L=16, capacity_factor=0.0)
    # capacity_factor=0 -> C=1: only the first token fits expert 0's queue.
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    # router that always picks expert 0 with certainty
    router = np.zeros((D, E), np.float32)
    router[:, 0] = 0.0  # uniform logits -> argmax = expert 0 deterministically
    params["router"]["kernel"] = jnp.asarray(router)
    y, _ = layer.apply({"params": params}, x)
    xt = x.reshape(-1, D)
    yt = y.reshape(-1, D)
    # all tokens route to expert 0, capacity 1: tokens 1.. are dropped
    np.testing.assert_array_equal(np.asarray(yt[1:]), np.asarray(xt[1:]))
    assert not np.allclose(np.asarray(yt[0]), np.asarray(xt[0]))


def test_moe_ep_sharded_matches_replicated():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("expert",), devices=jax.devices()[:8])
    layer, variables, x = _layer_and_inputs()
    want, aux_want = layer.apply(variables, x)

    sharded = {"params": shard_moe_params(variables["params"], mesh)}
    specs = ep_param_specs(variables["params"], mesh)
    assert specs["W1"] == jax.sharding.PartitionSpec("expert", None, None)
    assert specs["router"]["kernel"] == jax.sharding.PartitionSpec()

    got, aux_got = jax.jit(layer.apply)(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux_got), float(aux_want), rtol=1e-5)
    # the expert weights really are sharded over the mesh
    w1 = sharded["params"]["W1"]
    assert "expert" in (w1.sharding.spec or ())


@pytest.mark.slow
def test_moe_ep_grads_match_replicated():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("expert",), devices=jax.devices()[:8])
    layer, variables, x = _layer_and_inputs(L=16)

    def loss(v):
        y, aux = layer.apply(v, x)
        return jnp.sum(y**2) + 0.01 * aux

    g_rep = jax.grad(loss)(variables)
    sharded = {"params": shard_moe_params(variables["params"], mesh)}
    g_ep = jax.jit(jax.grad(loss))(sharded)
    for a, b in zip(jax.tree_util.tree_leaves(g_rep),
                    jax.tree_util.tree_leaves(g_ep)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_moe_composes_with_data_axis():
    """('data','expert') mesh: batch sharded over data, experts over expert —
    values still equal the replicated layer."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(("data", "expert"), shape=(2, 4), devices=jax.devices()[:8])
    layer, variables, x = _layer_and_inputs(batch=4)
    want, _ = layer.apply(variables, x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = {"params": shard_moe_params(variables["params"], mesh)}
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    got, _ = jax.jit(layer.apply)(sharded, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
