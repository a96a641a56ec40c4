"""Expert parallelism: a Switch-style MoE layer sharded over an `expert`
mesh axis.

The reference has NO mixture-of-experts (SURVEY.md §2.7 — DDP only); this is
the last TPU-native extension in the `parallel/` family (tp/zero/sp/pp/ep),
provided so the framework's parallelism matrix is complete for large-scale
deployments.

TPU-first design (the GShard/Switch recipe, not a port of anything):

* **Static shapes everywhere**: top-1 routing with a fixed per-expert
  capacity ``C = ceil(T/E · capacity_factor)``. Dispatch and combine are
  dense one-hot einsums — big MXU matmuls, no gather/scatter, no
  data-dependent shapes (XLA cannot tile dynamic shapes onto the MXU).
  Tokens routed past capacity fall through on the residual path (standard
  Switch semantics).
* **GSPMD, not manual collectives** (same philosophy as `parallel/tp.py`):
  the expert weights carry a leading ``E`` axis sharded ``P("expert")``;
  jit propagates the expert sharding through the dispatch/combine einsums
  and inserts the all-to-alls over ICI. The SAME jitted function runs
  single-chip (no `expert` axis) or expert-sharded, unchanged.
* **Load-balance aux loss** returned alongside the output
  (``E · Σ_e f_e · p_e`` — the Switch estimator; 1.0 at perfect balance)
  so a trainer can regularise routing.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


class SwitchFFN(nn.Module):
    """Top-1 token-choice MoE feed-forward: router -> capacity dispatch ->
    per-expert GELU MLP -> gated combine, with a residual passthrough for
    dropped tokens.

    Input/output: (..., L, d_model). Returns ``(y, aux_loss)``.
    """

    d_model: int
    d_ff: int
    n_experts: int
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        orig_shape = x.shape
        d = self.d_model
        E = self.n_experts
        xt = x.reshape(-1, d)  # (T, d)
        T = xt.shape[0]
        C = max(1, math.ceil(T / E * self.capacity_factor))

        logits = nn.Dense(E, use_bias=False, name="router")(
            xt.astype(jnp.float32)
        )  # (T, E)
        probs = jax.nn.softmax(logits, axis=-1)
        gate = jnp.max(probs, axis=-1)  # (T,)
        choice = jnp.argmax(probs, axis=-1)  # (T,)
        onehot = jax.nn.one_hot(choice, E, dtype=jnp.float32)  # (T, E)

        # Switch load-balance loss: E * sum_e (token fraction)·(prob mass).
        aux = E * jnp.sum(jnp.mean(onehot, axis=0) * jnp.mean(probs, axis=0))

        # position of each token within its expert's queue; >= C is dropped
        pos = jnp.cumsum(onehot, axis=0) - onehot  # exclusive rank, (T, E)
        keep = (pos < C) * onehot  # (T, E)
        slot = jax.nn.one_hot(
            jnp.sum(pos * onehot, axis=-1).astype(jnp.int32), C,
            dtype=jnp.float32,
        )  # (T, C)
        dispatch = keep[:, :, None] * slot[:, None, :]  # (T, E, C)

        W1 = self.param(
            "W1", nn.initializers.lecun_normal(), (E, d, self.d_ff), jnp.float32
        )
        W2 = self.param(
            "W2", nn.initializers.lecun_normal(), (E, self.d_ff, d), jnp.float32
        )

        xin = jnp.einsum("tec,td->ecd", dispatch, xt.astype(jnp.float32))
        h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", xin, W1))
        out_e = jnp.einsum("ecf,efd->ecd", h, W2)
        yt = jnp.einsum("tec,ecd->td", dispatch, out_e) * gate[:, None]
        y = (xt.astype(jnp.float32) + yt).astype(x.dtype)
        return y.reshape(orig_shape), aux


# Suffix rules in the same shape as parallel/tp.py's MAMBA_TP_RULES: the
# expert-stacked MLP weights shard their leading E axis.
MOE_EP_RULES = [
    (r"/W1$", lambda ax: P(ax, None, None)),
    (r"/W2$", lambda ax: P(ax, None, None)),
]


def shard_moe_params(tree, mesh: Mesh, axis: str = "expert"):
    """device_put a param-like pytree with expert weights sharded over
    ``axis`` (router and everything else replicated). Composes with
    `parallel.tp.shard_params` — run that first, then this (or vice versa);
    the rule sets are disjoint."""
    from mm_unet_tpu.parallel.tp import shard_params

    return shard_params(tree, mesh, axis=axis, rules=MOE_EP_RULES)


def ep_param_specs(tree, mesh: Mesh, axis: str = "expert"):
    from mm_unet_tpu.parallel.tp import tp_param_specs

    return tp_param_specs(tree, mesh, axis=axis, rules=MOE_EP_RULES)
