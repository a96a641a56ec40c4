"""Mamba language-model extras — inventory parity with the vendored stack
(`/root/reference/requirements/Mamba/mamba/mamba_ssm/models/mixer_seq_simple.py`
MixerModel/MambaLMHeadModel and `utils/generation.py` decode loop). Unused by
the segmentation trainer (as in the reference) but provided so the framework
covers the full component inventory, including the single-token decode path
(`mamba_simple.py:364-409` step()) on TPU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.mamba import Block, Mamba
from mm_unet_tpu.ops.causal_conv1d import causal_conv1d_update
from mm_unet_tpu.ops.state_update import selective_state_update

Array = jax.Array


class MixerModel(nn.Module):
    """Embedding + n_layer prenorm Mamba blocks + final norm
    (`mixer_seq_simple.py:83-170`)."""

    d_model: int
    n_layer: int
    vocab_size: int
    d_state: int = 16
    rms_norm: bool = False  # reference `mixer_seq_simple.py:25,37`
    fused_add_norm: bool = False  # reference `mixer_seq_simple.py:27,109-110`

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        h = nn.Embed(self.vocab_size, self.d_model, name="embedding")(input_ids)
        residual = None
        for i in range(self.n_layer):
            h, residual = Block(
                dim=self.d_model,
                rms_norm=self.rms_norm,
                fused_add_norm=self.fused_add_norm,
                mamba_kwargs={"d_state": self.d_state, "bimamba_type": "none"},
                name=f"layers_{i}",
            )(h, residual)
        residual = h + residual if residual is not None else h
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        return norm_cls(name="norm_f")(residual)


class MambaLMHeadModel(nn.Module):
    """MixerModel with a weight-tied LM head (`mixer_seq_simple.py:173-233`)."""

    d_model: int
    n_layer: int
    vocab_size: int
    d_state: int = 16
    rms_norm: bool = False
    fused_add_norm: bool = False

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        h = MixerModel(self.d_model, self.n_layer, self.vocab_size,
                       self.d_state, self.rms_norm, self.fused_add_norm,
                       name="backbone")(input_ids)
        embed = self.variables["params"]["backbone"]["embedding"]["embedding"]
        return h @ embed.T  # tied head


def mamba_step(params, x, conv_state, ssm_state, d_state=16, d_conv=4, expand=2):
    """Functional single-token Mamba step (reference `mamba_simple.py:364-409`)
    for bimamba_type='none' layers. x: (B, d_model); states roll forward.

    Returns (y (B, d_model), new_conv_state, new_ssm_state)."""
    d_model = params["out_proj_weight"].shape[0]
    d_inner = expand * d_model
    r = math.ceil(d_model / 16)
    xz = x @ params["in_proj_weight"].T  # (B, 2*d_inner)
    xi, z = jnp.split(xz, 2, axis=-1)

    xi, conv_state = causal_conv1d_update(
        xi, conv_state, params["conv1d_weight"], params.get("conv1d_bias"),
        activation="silu",
    )
    x_dbl = xi @ params["x_proj_weight"].T  # (B, r + 2N)
    dt = x_dbl[:, :r] @ params["dt_proj_weight"].T
    Bv = x_dbl[:, r : r + d_state]
    Cv = x_dbl[:, r + d_state :]
    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    y, ssm_state = selective_state_update(
        ssm_state, xi, dt, A, Bv, Cv,
        D=params["D"], z=z, dt_bias=params["dt_proj_bias"], dt_softplus=True,
    )
    return y @ params["out_proj_weight"].T, conv_state, ssm_state


def generate(
    model: MambaLMHeadModel,
    variables,
    input_ids: Array,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    rng: Optional[Array] = None,
    teacher_outputs: Optional[Array] = None,
    eos_token_id: Optional[int] = None,
) -> Array:
    """Greedy / top-k / top-p sampling decode loop (`utils/generation.py:207`
    analogue; filter order top-k then top-p as in the reference `sample`):
    prefill with the full forward, then per-token functional steps with
    rolling conv/SSM caches, all under jit-able ops.

    `teacher_outputs` (B, >=prompt+steps): instead of sampling, the token at
    absolute position p is taken from `teacher_outputs[:, p]` while p is in
    range (reference `generation.py:163-168` — useful for testing).
    `eos_token_id`: stop once EVERY sequence's current token is eos
    (reference `should_stop`, `generation.py:172-175`); the eos tokens are
    included in the output, matching the reference."""
    params = variables["params"]["backbone"]
    n_layer = model.n_layer
    d_model = model.d_model
    d_inner = 2 * d_model
    b = input_ids.shape[0]

    tokens = input_ids
    conv_states = [jnp.zeros((b, d_inner, 4), jnp.float32) for _ in range(n_layer)]
    ssm_states = [jnp.zeros((b, d_inner, model.d_state), jnp.float32) for _ in range(n_layer)]

    # warm the caches by stepping through the prompt
    embed = params["embedding"]["embedding"]
    for t in range(input_ids.shape[1]):
        h = embed[tokens[:, t]]
        residual = None
        for i in range(n_layer):
            lp = params[f"layers_{i}"]
            residual = h + residual if residual is not None else h
            hn = _layernorm(residual, lp["LayerNorm_0"])
            h, conv_states[i], ssm_states[i] = mamba_step(
                lp["Mamba_0"], hn, conv_states[i], ssm_states[i], model.d_state
            )
        final = h + residual
        final = _layernorm(final, params["norm_f"])
        logits = final @ embed.T

    if rng is None:
        rng = jax.random.key(0)
    out = [tokens]
    cur = None
    prompt_len = input_ids.shape[1]
    for step in range(max_new_tokens):
        pos = prompt_len + step  # == the reference's seqlen_offset at sample
        if teacher_outputs is not None and pos < teacher_outputs.shape[1]:
            cur = teacher_outputs[:, pos]
        elif top_k is not None or (top_p is not None and top_p < 1.0):
            rng, sub = jax.random.split(rng)
            lg = logits / max(temperature, 1e-6)
            if top_k is not None:
                kth = jax.lax.top_k(lg, top_k)[0][:, -1:]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            if top_p is not None and top_p < 1.0:
                lg = _top_p_filter(lg, top_p)
            cur = jax.random.categorical(sub, lg)
        else:
            cur = jnp.argmax(logits, axis=-1)
        out.append(cur[:, None])
        if eos_token_id is not None and bool(jnp.all(cur == eos_token_id)):
            break  # reference should_stop: every sequence hit eos
        h = embed[cur]
        residual = None
        for i in range(n_layer):
            lp = params[f"layers_{i}"]
            residual = h + residual if residual is not None else h
            hn = _layernorm(residual, lp["LayerNorm_0"])
            h, conv_states[i], ssm_states[i] = mamba_step(
                lp["Mamba_0"], hn, conv_states[i], ssm_states[i], model.d_state
            )
        final = h + residual
        final = _layernorm(final, params["norm_f"])
        logits = final @ embed.T
    return jnp.concatenate(out, axis=1)


def generate_scan(
    model: MambaLMHeadModel,
    variables,
    input_ids: Array,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    rng: Optional[Array] = None,
    teacher_outputs: Optional[Array] = None,
    eos_token_id: Optional[int] = None,
) -> Array:
    """Fully-jitted decode loop — the TPU-native equivalent of the
    reference's CUDA-graph decode machinery (`mamba_ssm/utils/generation.py`
    captures the per-token step in a CUDA graph to kill launch overhead; on
    TPU the same effect is one compiled `lax.scan` over decode steps with
    static cache shapes — zero per-token dispatch).

    Token-for-token equal to `generate` (same prefill/step math and the same
    top-k→top-p filter order); per-layer parameters and caches are stacked
    along a leading layer axis and the block stack runs as an inner
    `lax.scan`, so one compilation serves any n_layer.

    `teacher_outputs`/`eos_token_id` follow `generate` (and the reference
    `generation.py:163-175`), with one fixed-shape delta: the compiled scan
    always runs `max_new_tokens` steps, so after the all-sequences-eos stop
    point the remaining output positions are PADDED with `eos_token_id`
    (the reference's variable-length output simply ends there)."""
    params = variables["params"]["backbone"]
    n_layer = model.n_layer
    d_inner = 2 * model.d_model
    b, prompt_len = input_ids.shape
    embed = params["embedding"]["embedding"]

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[params[f"layers_{i}"] for i in range(n_layer)],
    )
    conv0 = jnp.zeros((n_layer, b, d_inner, 4), jnp.float32)
    ssm0 = jnp.zeros((n_layer, b, d_inner, model.d_state), jnp.float32)

    def token_step(token, conv_states, ssm_states):
        """One full-model step: (B,) int token -> (logits, new caches)."""
        h = embed[token]

        def layer(carry, xs):
            h, residual = carry
            lp, cs, ss = xs
            residual = h + residual
            hn = _layernorm(residual, lp["LayerNorm_0"])
            h, cs, ss = mamba_step(lp["Mamba_0"], hn, cs, ss, model.d_state)
            return (h, residual), (cs, ss)

        (h, residual), (conv_states, ssm_states) = jax.lax.scan(
            layer, (h, jnp.zeros_like(h)), (stacked, conv_states, ssm_states)
        )
        final = _layernorm(h + residual, params["norm_f"])
        return final @ embed.T, conv_states, ssm_states

    def prefill(carry, token):
        conv_states, ssm_states = carry
        logits, conv_states, ssm_states = token_step(token, conv_states, ssm_states)
        return (conv_states, ssm_states), logits

    (conv_states, ssm_states), logits_all = jax.lax.scan(
        prefill, (conv0, ssm0), jnp.moveaxis(input_ids, 1, 0)
    )
    logits = logits_all[-1]

    if rng is None:
        rng = jax.random.key(0)
    sample = top_k is not None or (top_p is not None and top_p < 1.0)

    # teacher-forcing plan, resolved statically per decode step: position
    # p = prompt_len + step indexes teacher_outputs (reference seqlen_offset)
    if teacher_outputs is not None:
        tlen = teacher_outputs.shape[1]
        forced = [
            teacher_outputs[:, prompt_len + s]
            if prompt_len + s < tlen else None
            for s in range(max_new_tokens)
        ]
        use_teacher = jnp.asarray(
            [f is not None for f in forced], jnp.bool_
        )
        pad_col = jnp.zeros((b,), input_ids.dtype)
        teacher_seq = jnp.stack(
            [f if f is not None else pad_col for f in forced]
        )  # (steps, B)
    else:
        use_teacher = jnp.zeros((max_new_tokens,), jnp.bool_)
        teacher_seq = jnp.zeros((max_new_tokens, b), input_ids.dtype)

    def decode(carry, xs):
        logits, conv_states, ssm_states, rng, stopped = carry
        use_t, teach = xs
        if sample:
            rng, sub = jax.random.split(rng)
            lg = logits / max(temperature, 1e-6)
            if top_k is not None:
                kth = jax.lax.top_k(lg, top_k)[0][:, -1:]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            if top_p is not None and top_p < 1.0:
                lg = _top_p_filter(lg, top_p)
            cur = jax.random.categorical(sub, lg)
        else:
            cur = jnp.argmax(logits, axis=-1)
        cur = jnp.where(use_t, teach.astype(cur.dtype), cur)
        if eos_token_id is not None:
            cur = jnp.where(stopped, jnp.asarray(eos_token_id, cur.dtype), cur)
            stopped = jnp.logical_or(stopped, jnp.all(cur == eos_token_id))
        logits, conv_states, ssm_states = token_step(cur, conv_states, ssm_states)
        return (logits, conv_states, ssm_states, rng, stopped), cur

    (*_, _), new_tokens = jax.lax.scan(
        decode,
        (logits, conv_states, ssm_states, rng, jnp.asarray(False)),
        (use_teacher, teacher_seq),
        length=max_new_tokens,
    )
    return jnp.concatenate([input_ids, jnp.moveaxis(new_tokens, 0, 1)], axis=1)


def _top_p_filter(logits: Array, top_p: float) -> Array:
    """Nucleus filtering (reference `modify_logits_for_top_p_filtering`,
    `mamba_ssm/utils/generation.py`): drop the ascending tail whose
    cumulative softmax probability is <= 1 - top_p."""
    srt = jnp.sort(logits, axis=-1)  # ascending
    cum = jnp.cumsum(jax.nn.softmax(srt, axis=-1), axis=-1)
    keep = cum > (1.0 - top_p)
    thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thresh, -jnp.inf, logits)


def _layernorm(x, p, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]
