"""MM_Net — the flagship Morph-Mamba U-Net, TPU-native rebuild.

Architecture parity with `/root/reference/src/UM_Net/MMUNet.py` (594 LoC):
ResNet-34-shaped encoder of MMConv ResidualBlocks, 1x1-MMConv channel
reducers, CBAM contour branch with a line-prediction head, three
reverse-context-gating (RCG) fusion modules with v3 Mamba detours, MMConv
decoder/side-out blocks, and a final sum of five bilinearly upsampled logit
maps (`MMUNet.py:532-585`).

TPU-first redesign choices:
- NHWC activations everywhere (XLA TPU conv layout); the reference NCHW
  interface is preserved at the model boundary.
- The deformable coordinate pipeline's sequential offset loop
  (`MMUNet.py:162-171`) is two cumsums; the two-row serpentine flatten
  (`:68-121`) is pure reshape/transpose; `grid_sample` (align_corners=True,
  zeros padding, `:218-224`) is a batched gather.
- All Mamba recurrences run on the Pallas selective-scan kernel with the three
  directions fused into one launch.
- `remat=True` wraps MMConv bodies in `jax.checkpoint` so the large deformed
  feature maps (B, H*k, W, C) are recomputed in backward instead of stored —
  the analogue of the reference's `checkpoint_lvl=1` recompute
  (`selective_scan_interface.py:218`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mm_unet_tpu.models.layers import (
    grid_sample_bilinear_nhwc,
    nchw_to_nhwc,
    nhwc_to_nchw,
    resize_bilinear_align_corners,
)
from mm_unet_tpu.models.mamba import Mamba
from mm_unet_tpu.models.registry import register_model
from mm_unet_tpu.ops.geometry import (
    accumulate_offsets_from_center_last,
    inverse_two_row_flatten_tokens,
    two_row_flatten_tokens,
)

Array = jax.Array

# _TapConv strategy threshold: maps with H <= this use the MXU 2-hot matmul
# sampler, taller maps the 2-gather row sampler (the (H_out x H_src) weight
# tensor grows quadratically). Env knob for A/B timing on hardware.
import os as _os  # noqa: E402

_TAP_MATMUL_MAX = int(_os.environ.get("MMU_TAP_MATMUL_MAX", "256"))


def _lkw(dtype):
    """Layer compute-dtype kwargs. `dtype` (the block-level knob threaded from
    `MM_Net.mamba_dtype`) governs the WHOLE feature path: conv/norm layers
    compute in it (flax keeps params and norm statistics in f32 — only the
    feature tensors carry reduced precision). Geometry-critical math
    (coordinate accumulation, interpolation weights, grid_sample coords) and
    the final logits stay f32 regardless."""
    return {} if dtype is None else {"dtype": dtype}


class MMConv(nn.Module):
    """Morph-Mamba deformable conv (reference `MMConv`, `MMUNet.py:10-274`).

    offset_conv 3x3 -> GroupNorm(k) -> tanh -> coordinate maps (cumulative
    y-offsets from kernel centre + TFM Mamba refinement over the raw offset
    field, blended by softplus(altho).clamp(0.01)) -> bilinear grid sample ->
    (k,1)-kernel stride-(k,1) conv (morph 0) -> GroupNorm(out/4).
    """

    out_channels: int
    kernel_size: int = 9
    extend_scope: float = 1.0
    morph: int = 0
    num_slices: int = 4
    remat: bool = False
    dtype: str | None = None  # Mamba stream compute dtype (bf16 perf knob)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.morph not in (0, 1):
            raise ValueError("morph should be 0 or 1.")
        b, h, w, _ = x.shape
        k = self.kernel_size
        center = k // 2
        kw = _lkw(self.dtype)

        offset = nn.Conv(2 * k, (3, 3), padding="SAME", **kw)(x)
        offset = nn.GroupNorm(num_groups=k, epsilon=1e-5, **kw)(offset)
        offset = jnp.tanh(offset)
        y_off = offset[..., :k]  # (B, H, W, K); x offsets are unused (ref parity)

        # cumulative offsets outward from the kernel centre (MMUNet.py:159-174)
        # — in f32 always: coordinates add to row indices up to H, where bf16
        # quantisation would snap samples to whole rows
        acc = accumulate_offsets_from_center_last(y_off.astype(jnp.float32))
        rows = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        cols = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        spread = jnp.linspace(-center, center, k, dtype=jnp.float32)[None, None, None, :]
        y_new = rows + acc * self.extend_scope  # (B, H, W, K)
        x_new = jnp.broadcast_to(cols + spread, y_new.shape)

        # TFM Mamba over the raw offset field (MMUNet.py:176-183)
        tokens = two_row_flatten_tokens(y_off)  # (B, H*W, K)
        m_out, _, _, _ = Mamba(
            d_model=k, d_state=16, d_conv=4, expand=2,
            bimamba_type="v3", nslices=self.num_slices, name="mamba",
            dtype=self.dtype,
        )(tokens)
        m_out = m_out.astype(jnp.float32)
        y_keep = inverse_two_row_flatten_tokens(m_out, h, w)

        altho = self.param("altho", lambda key: jnp.asarray(np.log(np.e - 1.0), jnp.float32))
        weight = jnp.clip(jax.nn.softplus(altho), min=0.01)
        y = weight * y_keep + y_new  # (MMUNet.py:186-188)

        def sample_conv(mdl, x, y):
            """Deform-sample + strided conv + GroupNorm. This (not the Mamba)
            is the memory hog — the (B, H*K, W, C) deformed tensor — so the
            remat boundary wraps exactly this part: recomputed in backward,
            while the scan's own chunk-state checkpointing stays untouched."""
            if self.morph == 0:
                # fast path: x taps are integer column shifts (clamped), so
                # sampling reduces to per-tap column shift + row interpolation;
                # the (k,1)-stride-k conv is fused into the tap loop
                out = _TapConv(self.out_channels, k, name="dsc_conv_x")(x, y)
            else:
                # generic grid_sample (clamp + rescale to [-1,1], MMUNet.py:229-242)
                y_map = y.transpose(0, 1, 3, 2).reshape(b, h * k, w)
                x_map = x_new.transpose(0, 1, 3, 2).reshape(b, h * k, w)
                y_s = jnp.clip(y_map, 0, h - 1) * (2.0 / max(h - 1, 1)) - 1.0
                x_s = jnp.clip(x_map, 0, w - 1) * (2.0 / max(w - 1, 1)) - 1.0
                deformed = grid_sample_bilinear_nhwc(x, jnp.stack([x_s, y_s], axis=-1))
                out = nn.Conv(
                    self.out_channels, (1, k), strides=(1, k), padding="VALID",
                    name="dsc_conv_y", **kw,
                )(deformed)
            # torch GroupNorm eps parity (flax defaults to 1e-6; torch 1e-5 —
            # visible on small-variance groups at deep-stage map sizes)
            return nn.GroupNorm(num_groups=self.out_channels // 4, epsilon=1e-5, **kw)(out)

        if self.remat:
            sample_conv = nn.remat(sample_conv)
        return sample_conv(self, x, y)


def _mmconv(out_ch, k, ns, name=None, remat=False, dtype=None):
    return MMConv(out_channels=out_ch, kernel_size=k, num_slices=ns, name=name,
                  remat=remat, dtype=dtype)


class _TapConv(nn.Module):
    """Fused morph-0 deform-sample + (k,1)-stride-k conv.

    The reference samples a (B, H*K, W, C) deformed tensor and immediately
    convolves it with a (k,1) kernel at stride (k,1) (`MMUNet.py:218-227,
    245-250`) — i.e. the conv is exactly a per-tap weighted sum. Fusing the
    channel projection into the tap loop means the tap-interleaved tensor
    never materialises (its stack/relayout copies were ~3% of the round-2
    train step). Parameter tree matches `nn.Conv(features, (k,1))` (kernel
    (k,1,C,F) + bias) so checkpoints are interchangeable.
    """

    features: int
    k: int

    @nn.compact
    def __call__(self, feat: Array, y_coords: Array) -> Array:
        b, h, w, c = feat.shape
        k = self.k
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, 1, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x_shifts = [j - k // 2 for j in range(k)]

        if h > _TAP_MATMUL_MAX:
            # tall maps: the (H x H) 2-hot matrix would dominate — gather path
            from mm_unet_tpu.models.layers import deform_sample_rows

            deformed = deform_sample_rows(feat, y_coords, x_shifts)
            out = jax.lax.conv_general_dilated(
                deformed, kernel.astype(feat.dtype), window_strides=(k, 1),
                padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + bias.astype(out.dtype)

        # TPU: fused Pallas kernel — the 2-hot hat matrix lives one VMEM tile
        # at a time instead of as a (B, H, W, K, H) HBM tensor (~20 ms/step of
        # HBM traffic across the MM_Net stages, profiled round 3). The XLA
        # matmul path below stays for CPU, odd widths, and A/B isolation
        # (MMU_TAP_IMPL=xla).
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        if (on_tpu and w % 8 == 0
                and _os.environ.get("MMU_TAP_IMPL", "pallas") == "pallas"):
            from mm_unet_tpu.ops.tap_conv import tap_conv

            return tap_conv(feat, y_coords, kernel, bias, x_shifts)

        kb = kernel.astype(feat.dtype)
        # bilinear hat: 2-hot row-interpolation weights (see
        # layers.deform_sample_rows_matmul). Built in f32 regardless of the
        # feature dtype: |src - yc| at row coordinates up to H would quantise
        # to whole rows in bf16; the weights themselves (in [0,1]) cast fine.
        yc = jnp.clip(y_coords.astype(jnp.float32), 0, h - 1)
        src = jnp.arange(h, dtype=jnp.float32)
        m = jnp.maximum(
            0.0, 1.0 - jnp.abs(src[None, None, None, None, :] - yc[..., None])
        ).astype(feat.dtype)
        acc = None
        for j, dx in enumerate(x_shifts):
            if dx == 0:
                xs = feat
            elif dx > 0:
                xs = jnp.concatenate(
                    [feat[:, :, dx:], jnp.repeat(feat[:, :, -1:], dx, axis=2)], axis=2
                )
            else:
                xs = jnp.concatenate(
                    [jnp.repeat(feat[:, :, :1], -dx, axis=2), feat[:, :, :dx]], axis=2
                )
            tap = jnp.einsum("bhws,bswc->bhwc", m[:, :, :, j], xs)
            prj = jnp.einsum(
                "bhwc,cf->bhwf", tap, kb[j, 0],
                preferred_element_type=jnp.float32,
            )
            acc = prj if acc is None else acc + prj
        return (acc + bias).astype(feat.dtype)


@jax.custom_vjp
def _conv_wgrad_via_im2col(x: Array, kernel: Array) -> Array:
    """`lax.conv_general_dilated(x, kernel, SAME, NHWC)` with a custom weight
    gradient: XLA lowers the degenerate (C_in=2, C_out=1) convolution's
    weight gradient at 256² to a scalar loop fusion (~4.6 ms/step measured),
    so dk is computed as an im2col matmul instead. The input gradient keeps
    XLA's own transposed-conv rule (fast), and the forward is the plain conv."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_wgrad_fwd(x, kernel):
    return _conv_wgrad_via_im2col(x, kernel), (x, kernel)


def _conv_wgrad_bwd(res, g):
    x, kernel = res
    kh, kw, cin, cout = kernel.shape
    # input grad: XLA's own conv-transpose rule via vjp of the plain conv
    dx = jax.vjp(
        lambda x_: jax.lax.conv_general_dilated(
            x_, kernel.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        x,
    )[1](g.astype(x.dtype))[0]
    # weight grad: im2col patches (feature order channel-major: (c, kh, kw))
    # contracted against the cotangent on the MXU. In bf16 feature configs
    # the patches/cotangent feed the dot in bf16 (f32 accumulation via
    # preferred_element_type) — the f32 patches tensor was ~3 ms/step of HBM
    # traffic at 256² (r3 trace); f32 configs stay f32 (parity).
    pdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype
    p = jax.lax.conv_general_dilated_patches(
        x.astype(pdt), (kh, kw), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(-1, cin * kh * kw)
    dk = jnp.einsum("pf,po->fo", p, g.reshape(-1, cout).astype(pdt),
                    preferred_element_type=jnp.float32)
    dk = dk.reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3)
    return dx, dk.astype(kernel.dtype)


_conv_wgrad_via_im2col.defvjp(_conv_wgrad_fwd, _conv_wgrad_bwd)


class _SpatialConv(nn.Module):
    """CBAM's 7x7 2->1 spatial-attention conv. Functionally identical to
    `nn.Conv(1, (7, 7), padding="SAME", use_bias=False)` and
    parameter-compatible with it (param "kernel", (k, k, c_in, 1)); see
    `_conv_wgrad_via_im2col` for why the weight gradient is custom."""

    k: int = 7
    c_in: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.k, self.k, self.c_in, 1)
        )
        return _conv_wgrad_via_im2col(x, kernel)


class CBAM(nn.Module):
    """Channel + spatial attention (reference `MMUNet.py:313-338`)."""

    channel: int
    reduction: int = 16
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kw = _lkw(self.dtype)
        mlp = nn.Sequential([
            nn.Conv(self.channel // self.reduction, (1, 1), use_bias=False, **kw),
            nn.relu,
            nn.Conv(self.channel, (1, 1), use_bias=False, **kw),
        ])
        # spatial means accumulate in f32 (bf16 reduce over 64k pixels drifts)
        c_avg = mlp(jnp.mean(x, axis=(1, 2), keepdims=True,
                             dtype=jnp.float32).astype(x.dtype))
        c_max = mlp(jnp.max(x, axis=(1, 2), keepdims=True))
        y1 = jax.nn.sigmoid(c_avg + c_max) * x
        s_avg = jnp.mean(y1, axis=-1, keepdims=True,
                         dtype=jnp.float32).astype(y1.dtype)
        s_max = jnp.max(y1, axis=-1, keepdims=True)
        s = _SpatialConv(name="Conv_2")(jnp.concatenate([s_max, s_avg], axis=-1))
        return jax.nn.sigmoid(s) * y1


class SideoutBlock(nn.Module):
    """MMConv -> BN -> ReLU -> Dropout2d(0.1) -> 1x1 conv (`MMUNet.py:341-352`)."""

    in_channels: int
    out_channels: int
    num_slices: int = 4
    remat: bool = False
    dtype: str | None = None
    drop: float = 0.1  # Dropout2d rate; 0 disables (trajectory-parity tests)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = _lkw(self.dtype)
        x = _mmconv(self.in_channels // 4, 3, self.num_slices, remat=self.remat,
                    dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop, broadcast_dims=(1, 2),
                       deterministic=not train or self.drop == 0.0)(x)
        return nn.Conv(self.out_channels, (1, 1), **kw)(x)


class RCG(nn.Module):
    """Reverse-context gating with a Mamba detour (`MMUNet.py:354-418`)."""

    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    num_slices: int = 4
    remat: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(self, pre: Array, edge: Array, f: Array, train: bool = False) -> Array:
        kw = _lkw(self.dtype)
        r = (1.0 - jax.nn.sigmoid(pre)) * f
        edge1 = resize_bilinear_align_corners(edge, f.shape[1:3])
        x1 = jnp.concatenate([edge1.astype(r.dtype), r], axis=-1)  # (B, H, W, 128)
        x2 = _mmconv(64, 3, self.num_slices, remat=self.remat,
                     dtype=self.dtype)(x1, train)
        x2 = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x2)
        x2 = nn.relu(x2)

        x0 = nn.ConvTranspose(64, (4, 4), strides=(2, 2), padding="SAME", **kw)(x2)
        b, h2, w2, c = x0.shape
        tokens = x0.reshape(b, h2 * w2, c)
        out, _, _, _ = Mamba(
            d_model=64, d_state=self.d_state, d_conv=self.d_conv, expand=self.expand,
            bimamba_type="v3", nslices=self.num_slices, name="mamba",
            dtype=self.dtype,
        )(tokens)
        out_m = out.astype(x2.dtype).reshape(b, h2, w2, c)
        x0 = nn.Conv(64, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), **kw)(out_m)

        x3 = jax.nn.sigmoid(nn.Conv(1, (1, 1), **kw)(x2))
        return x0 * x3 * x2 + f


class DecoderBlock(nn.Module):
    """Two MMConvs + 2x bilinear upsample (`MMUNet.py:420-431`)."""

    in_channels: int
    out_channels: int
    num_slices: int = 4
    remat: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = _lkw(self.dtype)
        x = _mmconv(self.in_channels // 4, 3, self.num_slices, remat=self.remat,
                    dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = _mmconv(self.out_channels, 3, self.num_slices, remat=self.remat,
                    dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        return resize_bilinear_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))


class ResidualBlock(nn.Module):
    """MMConv residual block (`MMUNet.py:433-467`)."""

    in_channels: int
    out_channels: int
    num_slices: int
    downsample: bool = False
    remat: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = _lkw(self.dtype)

        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(v)

        if self.downsample:
            x1 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), use_bias=False, **kw)(x)
            x1 = nn.relu(bn(x1))
            x1 = _mmconv(self.out_channels, 3, self.num_slices, remat=self.remat,
                         dtype=self.dtype)(x1, train)
            x1 = bn(x1)
            sc = nn.Conv(self.out_channels, (1, 1), strides=(2, 2),
                         use_bias=False, **kw)(x)
            return nn.relu(bn(sc) + x1)
        x1 = _mmconv(self.out_channels, 3, self.num_slices, remat=self.remat,
                     dtype=self.dtype)(x, train)
        x1 = nn.relu(bn(x1))
        x1 = _mmconv(self.out_channels, 3, self.num_slices, remat=self.remat,
                     dtype=self.dtype)(x1, train)
        x1 = bn(x1)
        return nn.relu(x1 + x)


def validate_input_size(h: int, w: int, num_slices_list=(64, 32, 16, 8)):
    """Check MM_Net's v3 slice-scan divisibility constraints for an input size.

    Stage i scans (h/2^(i+1))*(w/2^(i+1)) tokens with num_slices_list[i]
    slices; the reference's `xz.chunk(nslices)` -> `torch.stack` requires
    exact divisibility (`requirements/mamba_simple.py:245-247`) or it CRASHES
    — e.g. the reference's own STARE 704² config is infeasible for MM_Net as
    shipped: stage 5 has (704/32)² = 484 tokens and 484 % 8 != 0. 704 IS
    feasible with num_slices_list=(64, 32, 16, 4) (every stage divides), which
    preserves the reference's STARE protocol anchor.

    Raises ValueError naming the failing stage; returns per-stage token counts.
    """
    if h % 32 or w % 32:
        raise ValueError(f"MM_Net input must be divisible by 32, got {h}x{w}")
    tokens = []
    for i, ns in enumerate(num_slices_list):
        t = (h // (4 << i)) * (w // (4 << i))
        tokens.append(t)
        if t % ns:
            raise ValueError(
                f"MM_Net stage {i + 2}: {t} tokens not divisible by "
                f"num_slices_list[{i}]={ns} (input {h}x{w}). Choose a slice "
                f"list whose entries divide the per-stage token counts "
                f"{tokens} — e.g. 704² works with (64, 32, 16, 4)."
            )
    return tokens


@register_model("MM_Net")
class MM_Net(nn.Module):
    """Flagship model (`MMUNet.py:474-585`). Input (B, 3, H, W) NCHW; output
    (B, num_classes, H, W) = sum of 4 side outputs + contour logits, all
    bilinearly upsampled (align_corners=True) to the input size.

    H and W must be divisible by 32, with (H/32)*(W/32) divisible by
    num_slices_list[3] (the v3 slice scan constraint, SURVEY.md §5).
    """

    num_classes: int = 1
    num_slices_list: Sequence[int] = (64, 32, 16, 8)
    out_indices: Sequence[int] = (0, 1, 2, 3)  # config parity; unused (ref parity)
    heads: Sequence[int] = (1, 2, 4, 4)  # config parity; unused (ref parity)
    remat: bool = True
    depths: Sequence[int] = (3, 4, 6, 3)  # ResNet-34-shaped stage depths (ref default)
    # Compute dtype for the WHOLE feature path: conv/norm layers, Mamba
    # streams, attention. Params, norm statistics, the scan state, coordinate
    # geometry and the output logits stay f32 (see `_lkw`). None -> full f32
    # (the reference's training precision; used by the parity tests).
    mamba_dtype: str | None = "bfloat16"
    sideout_drop: float = 0.1  # SideoutBlock Dropout2d rate (ref MMUNet.py:345)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ns = list(self.num_slices_list)
        rm = self.remat
        dty = self.mamba_dtype
        kw = _lkw(dty)
        x = nchw_to_nhwc(x)
        in_hw = x.shape[1:3]

        # stem (MMUNet.py:492-493)
        e1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                     use_bias=False, **kw)(x)  # torch pad 3 (MMUNet.py:492)
        e1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(e1)
        e1 = nn.relu(e1)
        e1_pool = nn.max_pool(e1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # encoder stages 3/4/6/3 (MMUNet.py:494-497)
        d1, d2_, d3_, d4_ = self.depths
        e2 = e1_pool
        for _ in range(d1):
            e2 = ResidualBlock(64, 64, ns[0], remat=rm, dtype=dty)(e2, train)
        e3 = ResidualBlock(64, 128, ns[1], downsample=True, remat=rm, dtype=dty)(e2, train)
        for _ in range(d2_ - 1):
            e3 = ResidualBlock(128, 128, ns[1], remat=rm, dtype=dty)(e3, train)
        e4 = ResidualBlock(128, 256, ns[2], downsample=True, remat=rm, dtype=dty)(e3, train)
        for _ in range(d3_ - 1):
            e4 = ResidualBlock(256, 256, ns[2], remat=rm, dtype=dty)(e4, train)
        e5 = ResidualBlock(256, 512, ns[3], downsample=True, remat=rm, dtype=dty)(e4, train)
        for _ in range(d4_ - 1):
            e5 = ResidualBlock(512, 512, ns[3], remat=rm, dtype=dty)(e5, train)

        # 1x1 MMConv channel reducers (MMUNet.py:502-504)
        def down(v, k_ns):
            v = _mmconv(64, 1, k_ns, remat=rm, dtype=dty)(v, train)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(v)
            return nn.relu(v)

        e3d = down(e3, ns[-1])
        e4d = down(e4, ns[-1])
        e5d = down(e5, ns[-1])

        # decoder5 + side5 (MMUNet.py:549-550)
        d5 = DecoderBlock(64, 64, ns[3], remat=rm, dtype=dty)(e5d, train)
        out5 = SideoutBlock(64, self.num_classes, ns[3], remat=rm, dtype=dty,
                             drop=self.sideout_drop)(d5, train)

        # contour branch (MMUNet.py:508-511,553-556)
        c1 = nn.Conv(64, (3, 3), padding="SAME", **kw)(e1)
        c1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(c1)
        c1 = nn.relu(c1)
        c1 = CBAM(64, dtype=dty)(c1)
        c1 = nn.Conv(64, (3, 3), padding="SAME", **kw)(c1)
        c1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(c1)
        c1 = nn.relu(c1)
        p_c = nn.Conv(1, (3, 3), padding="SAME", **kw)(c1)

        # decoder cascade with RCG gating (MMUNet.py:559-574)
        r4 = RCG(num_slices=ns[2], remat=rm, dtype=dty)(out5, c1, e4d, train)
        d4 = DecoderBlock(128, 64, ns[2], remat=rm, dtype=dty)(jnp.concatenate([d5, r4], -1), train)
        out4 = SideoutBlock(64, self.num_classes, ns[2], remat=rm, dtype=dty,
                             drop=self.sideout_drop)(d4, train)

        r3 = RCG(num_slices=ns[1], remat=rm, dtype=dty)(out4, c1, e3d, train)
        d3 = DecoderBlock(128, 64, ns[1], remat=rm, dtype=dty)(jnp.concatenate([d4, r3], -1), train)
        out3 = SideoutBlock(64, self.num_classes, ns[1], remat=rm, dtype=dty,
                             drop=self.sideout_drop)(d3, train)

        r2 = RCG(num_slices=ns[0], remat=rm, dtype=dty)(out3, c1, e2, train)
        d2 = DecoderBlock(128, 64, ns[0], remat=rm, dtype=dty)(jnp.concatenate([d3, r2], -1), train)
        out2 = SideoutBlock(64, self.num_classes, ns[0], remat=rm, dtype=dty,
                             drop=self.sideout_drop)(d2, train)

        # sum of upsampled logits (MMUNet.py:577) — logits in f32 (the loss,
        # metrics, and sigmoid thresholds all consume f32 regardless of the
        # feature-path compute dtype)
        total = sum(
            resize_bilinear_align_corners(o.astype(jnp.float32), in_hw)
            for o in (out2, out3, out4, out5, p_c)
        )
        return nhwc_to_nchw(total)
