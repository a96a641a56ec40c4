"""LM extras: decode step parity with the parallel scan, generation loop."""

import jax
import jax.numpy as jnp
import numpy as np

from mm_unet_tpu.models.lm import MambaLMHeadModel, generate


def test_decode_step_matches_parallel_forward():
    model = MambaLMHeadModel(d_model=16, n_layer=2, vocab_size=50, d_state=8)
    ids = jax.random.randint(jax.random.key(0), (2, 8), 0, 50)
    variables = jax.jit(model.init)(jax.random.key(1), ids)

    full = jax.jit(model.apply)(variables, ids)  # (B, L, V) via parallel scan

    # decode loop: generate 0 new tokens -> logits after consuming the prompt
    out = generate(model, variables, ids, max_new_tokens=1)
    assert out.shape == (2, 9)

    # stepwise logits at the last prompt position must match the parallel scan
    from mm_unet_tpu.models.lm import _layernorm, mamba_step

    params = variables["params"]["backbone"]
    embed = params["embedding"]["embedding"]
    b = ids.shape[0]
    conv_states = [jnp.zeros((b, 32, 4)) for _ in range(2)]
    ssm_states = [jnp.zeros((b, 32, 8)) for _ in range(2)]
    logits = None
    for t in range(ids.shape[1]):
        h = embed[ids[:, t]]
        residual = None
        for i in range(2):
            lp = params[f"layers_{i}"]
            residual = h + residual if residual is not None else h
            hn = _layernorm(residual, lp["LayerNorm_0"])
            h, conv_states[i], ssm_states[i] = mamba_step(
                lp["Mamba_0"], hn, conv_states[i], ssm_states[i], d_state=8
            )
        final = _layernorm(h + residual, params["norm_f"])
        logits = final @ embed.T
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, -1]), rtol=2e-3, atol=2e-3
    )


def test_generate_greedy_deterministic():
    model = MambaLMHeadModel(d_model=16, n_layer=1, vocab_size=30, d_state=8)
    ids = jax.random.randint(jax.random.key(0), (1, 4), 0, 30)
    variables = jax.jit(model.init)(jax.random.key(1), ids)
    a = generate(model, variables, ids, max_new_tokens=5)
    b = generate(model, variables, ids, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (1, 9)


def test_top_p_filter_semantics():
    """Nucleus filter: keeps the smallest prefix of descending-prob tokens
    covering top_p; tiny top_p degenerates to argmax-only."""
    import jax.numpy as jnp
    import numpy as np

    from mm_unet_tpu.models.lm import _top_p_filter

    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    probs = np.exp(np.asarray(logits[0])) / np.exp(np.asarray(logits[0])).sum()
    # top_p just above p(max): the top token plus the next survive
    out = np.asarray(_top_p_filter(logits, float(probs[0]) + 1e-4))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert not np.isfinite(out[0, 2]) and not np.isfinite(out[0, 3])
    # top_p below p(max): only argmax survives
    out = np.asarray(_top_p_filter(logits, float(probs[0]) - 1e-3))
    assert np.isfinite(out[0, 0]) and not np.isfinite(out[0, 1:]).any()
    # top_p = 1: keeps everything
    out = np.asarray(_top_p_filter(logits, 1.0))
    assert np.isfinite(out).all()


def test_generate_scan_matches_python_loop():
    """The fully-jitted lax.scan decode (the TPU stand-in for the reference's
    CUDA-graph machinery) must be token-for-token equal to the Python-loop
    `generate` — greedy and sampled (same rng, same filter order)."""
    from mm_unet_tpu.models.lm import generate_scan

    model = MambaLMHeadModel(d_model=16, n_layer=2, vocab_size=30, d_state=8)
    ids = jax.random.randint(jax.random.key(0), (2, 4), 0, 30)
    variables = jax.jit(model.init)(jax.random.key(1), ids)

    a = generate(model, variables, ids, max_new_tokens=6)
    b = generate_scan(model, variables, ids, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = jax.random.key(7)
    a = generate(model, variables, ids, max_new_tokens=6, temperature=0.8,
                 top_k=5, top_p=0.9, rng=rng)
    b = generate_scan(model, variables, ids, max_new_tokens=6, temperature=0.8,
                      top_k=5, top_p=0.9, rng=rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_scan_jits_whole_loop():
    """generate_scan composes under one jit (static model/token counts):
    the entire prefill+decode is a single compiled program."""
    from functools import partial

    from mm_unet_tpu.models.lm import generate_scan

    model = MambaLMHeadModel(d_model=16, n_layer=1, vocab_size=30, d_state=8)
    ids = jax.random.randint(jax.random.key(0), (1, 4), 0, 30)
    variables = jax.jit(model.init)(jax.random.key(1), ids)
    f = jax.jit(partial(generate_scan, model, max_new_tokens=5))
    out = f(variables, ids)
    assert out.shape == (1, 9)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(generate(model, variables, ids, 5))
    )


def test_generate_teacher_forcing_and_eos():
    """teacher_outputs replaces sampling at in-range positions and eos stops
    the whole batch (reference `generation.py:163-175`); the jitted scan
    agrees up to its documented eos-padded fixed-shape output."""
    from mm_unet_tpu.models.lm import generate_scan

    model = MambaLMHeadModel(d_model=16, n_layer=2, vocab_size=30, d_state=8)
    ids = jax.random.randint(jax.random.key(0), (2, 4), 0, 30)
    variables = jax.jit(model.init)(jax.random.key(1), ids)

    # teacher covers prompt + 3 decode steps: those 3 tokens are forced,
    # the remaining steps fall back to greedy sampling
    teacher = jax.random.randint(jax.random.key(3), (2, 7), 1, 30)
    a = generate(model, variables, ids, 6, teacher_outputs=teacher)
    np.testing.assert_array_equal(np.asarray(a[:, 4:7]), np.asarray(teacher[:, 4:7]))
    b = generate_scan(model, variables, ids, 6, teacher_outputs=teacher)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eos stop: force eos for every sequence at decode step 1 -> the python
    # loop stops there (output ends at the eos column), the jitted scan pads
    # the remaining fixed-shape columns with eos
    eos = 5
    teacher_eos = teacher.at[:, 5].set(eos)
    a = generate(model, variables, ids, 6, teacher_outputs=teacher_eos,
                 eos_token_id=eos)
    assert a.shape[1] == 6  # prompt 4 + forced step + the all-eos column
    assert np.all(np.asarray(a[:, -1]) == eos)
    b = generate_scan(model, variables, ids, 6, teacher_outputs=teacher_eos,
                      eos_token_id=eos)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b[:, : a.shape[1]]))
    assert np.all(np.asarray(b[:, a.shape[1]:]) == eos)
