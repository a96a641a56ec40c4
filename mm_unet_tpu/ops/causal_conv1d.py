"""Causal depthwise 1-D convolution (TPU-native).

Replaces the reference CUDA kernels
(`/root/reference/requirements/Mamba/causal-conv1d/csrc/causal_conv1d_fwd.cu`,
`causal_conv1d_bwd.cu`, `causal_conv1d_update.cu`) with a fused XLA depthwise
convolution: `lax.conv_general_dilated` with `feature_group_count=D` and left
padding `width-1`. XLA fuses the optional SiLU epilogue; no custom kernel is
needed for this op on TPU (the conv maps onto the hardware conv/MXU path and is
a tiny fraction of the scan cost). Semantics match `causal_conv1d_ref`
(`causal_conv1d/causal_conv1d_interface.py:49-65`): fp32 accumulation, output
cast back to input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def causal_conv1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = None,
    reverse: bool = False,
) -> Array:
    """Causal depthwise conv.

    Args:
      x: (B, D, L) input.
      weight: (D, W) depthwise filters (reference layout `d 1 w -> d w`).
      bias: optional (D,).
      activation: None or "silu"/"swish".
      reverse: anti-causal variant — equivalent to
        `flip(causal_conv1d(flip(x)))` without materialising the flips; used
        for the backward direction of bi-Mamba so its operand stream stays in
        natural token order end-to-end.

    Returns: (B, D, L), same dtype as x.
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError(f"activation {activation}")
    dtype_in = x.dtype
    d, w = weight.shape
    xf = x.astype(jnp.float32)
    wf = weight.astype(jnp.float32)

    if w <= 8:
        # TPU fast path: a short depthwise causal conv is w shifted
        # multiply-adds — pure VPU elementwise, avoiding XLA's grouped-conv
        # lowering (weak on TPU for feature_group_count == channels).
        L = xf.shape[-1]
        out = xf * wf[None, :, -1:]
        for j in range(w - 1):
            shift = w - 1 - j  # tap j multiplies x[t -+ shift]
            if reverse:
                xs = jnp.pad(xf[:, :, shift:], ((0, 0), (0, 0), (0, shift)))
            else:
                xs = jnp.pad(xf[:, :, : L - shift], ((0, 0), (0, 0), (shift, 0)))
            out = out + xs * wf[None, :, j : j + 1]
    else:
        out = jax.lax.conv_general_dilated(
            xf,
            wf[:, None, ::-1] if reverse else wf[:, None, :],  # (O=D, I/g=1, W)
            window_strides=(1,),
            padding=[(0, w - 1)] if reverse else [(w - 1, 0)],
            feature_group_count=d,
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    if activation in ("silu", "swish"):
        out = jax.nn.silu(out)
    return out.astype(dtype_in)


def causal_conv1d_update(
    x: Array,
    conv_state: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = None,
) -> tuple[Array, Array]:
    """Single-token decode step (reference `causal_conv1d_update.cu` /
    `causal_conv1d_interface.py:68-80`), functional (returns new state).

    Args:
      x: (B, D) current token.
      conv_state: (B, D, W) rolling buffer of the last W inputs.
      weight: (D, W); bias optional (D,).

    Returns: (out (B, D), new_conv_state (B, D, W)).
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError(f"activation {activation}")
    dtype_in = x.dtype
    state = jnp.roll(conv_state, shift=-1, axis=-1)
    state = state.at[:, :, -1].set(x)
    out = jnp.sum(state.astype(jnp.float32) * weight.astype(jnp.float32)[None], axis=-1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None]
    if activation in ("silu", "swish"):
        out = jax.nn.silu(out)
    return out.astype(dtype_in), state
