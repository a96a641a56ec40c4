"""TFM ("Token Flow Module") Mamba block — TPU-native rebuild.

Reimplements the modified Mamba module the reference installs over the stock
mamba_ssm (`/root/reference/requirements/mamba_simple.py:34-362`):

- `bimamba_type="v3"`: THREE selective scans with independent weight sets —
  (1) forward over the token sequence, (2) backward over the flipped sequence
  (weights `*_b`), (3) a slice-interleaved "spatial" scan (weights `*_s`) that
  reorders tokens so position i of every one of `nslices` slices is adjacent
  (`mamba_simple.py:245-263`), then un-interleaves. Output = out_proj(out_fwd +
  flip(out_bwd) + out_spatial); also returns the three pre-projection outputs
  (`mamba_simple.py:267-270`).
- `bimamba_type="v2"`: forward + flipped backward (vendored module behaviour,
  single return value — used by dkDualNet).
- `bimamba_type="none"`: single direction.

Per the survey (SURVEY.md §2.2), the reference's `bimamba_type="v1"`
annotation in MMConv is inconsistent with its own assert and would crash; the
only self-consistent configuration is v3, so "v1" is treated as v3 here.

Parameter init parity: dt_proj weight ~ U(±dt_rank^-0.5·dt_scale), dt_proj
bias = softplus^-1(clip(exp(U(log dt_min, log dt_max)), dt_init_floor))
(`mamba_simple.py:89-108`); A_log = log(1..d_state) per channel (S4D-real,
`:110-117`); D = 1. A_log/D are tagged for no-weight-decay by name (see
`mm_unet_tpu.train.optim.wd_mask`).

The three directional scans are fused into ONE batched Pallas selective-scan
call (directions stacked along the batch axis) so the TPU sees a single large
kernel launch instead of three small ones; the per-direction projections are
likewise batched with `jnp.einsum` over a direction axis — MXU-friendly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.ops.causal_conv1d import causal_conv1d
from mm_unet_tpu.ops.mamba_fused import mamba_fused_scan
from mm_unet_tpu.ops.selective_scan import selective_scan

Array = jax.Array


def _dt_bias_init(dt_min, dt_max, dt_init_floor):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, min=dt_init_floor)
        # softplus^-1(dt) = dt + log(-expm1(-dt))
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def _a_log_init(d_state):
    def init(key, shape, dtype=jnp.float32):
        d_inner = shape[0]
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32)[None], (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


class Mamba(nn.Module):
    """Selective-state-space mixer over (B, L, d_model) token sequences."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | str = "auto"
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    bimamba_type: str = "v3"
    nslices: int = 5
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 for perf runs)
    scan_impl: Optional[str] = None

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def _dt_rank(self) -> int:
        return math.ceil(self.d_model / 16) if self.dt_rank == "auto" else self.dt_rank

    def _dir_params(self, name: str):
        """One direction's weight set (suffix '' / '_b' / '_s')."""
        d_in, r, n, w = self.d_inner, self._dt_rank, self.d_state, self.d_conv
        dt_std = r**-0.5 * self.dt_scale
        if self.dt_init == "constant":
            dt_kernel_init = nn.initializers.constant(dt_std)
        elif self.dt_init == "random":
            dt_kernel_init = nn.initializers.uniform(scale=2 * dt_std)  # shifted below
        else:
            raise NotImplementedError(self.dt_init)

        conv_w = self.param(f"conv1d{name}_weight", nn.initializers.lecun_normal(), (d_in, w))
        conv_b = (
            self.param(f"conv1d{name}_bias", nn.initializers.zeros, (d_in,))
            if self.conv_bias
            else None
        )
        x_proj = self.param(f"x_proj{name}_weight", nn.initializers.lecun_normal(), (r + 2 * n, d_in))
        dt_w = self.param(f"dt_proj{name}_weight", dt_kernel_init, (d_in, r))
        if self.dt_init == "random":
            dt_w = dt_w - dt_std  # U(0, 2s) -> U(-s, s)
        dt_b = self.param(
            f"dt_proj{name}_bias", _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor), (d_in,)
        )
        a_log = self.param(f"A{name}_log", _a_log_init(self.d_state), (d_in, self.d_state))
        d_skip = self.param(f"D{name}", nn.initializers.ones, (d_in,))
        return conv_w, conv_b, x_proj, dt_w, dt_b, a_log, d_skip

    def _mega_scan(self, xz_dirs: list[Array], params: list, has_rev: bool):
        """Fused-kernel path: causal conv + projections + scan + gate in ONE
        Pallas kernel (`ops/mamba_fused.py`), the reversed direction scanned
        right-to-left in-kernel with an anti-causal conv — no operand flips,
        no materialised conv output or dt/B/C streams.

        xz_dirs order: forward[, slice-interleaved][, reverse] (reverse LAST,
        in natural token order). Returns a list of (B, D, L) per-direction
        outputs in the stream dtype, each in its own token domain.

        Every direction launches separately on a (B, 1, 2D, L) VIEW of its
        xz — never a jnp.stack. The grid work is identical to a G-batched
        launch, and the (B, G, 2D, L) direction-stack copies (plus their
        backward-side unstack/pad fusions) disappear from the step.
        """
        cdtype = self.dtype or xz_dirs[0].dtype

        def one(i, reverse=False):
            p = params[i]
            conv_w = p[0][None].astype(cdtype)  # (1, D, W)
            conv_b = p[1][None] if p[1] is not None else None
            x_proj = p[2][None].astype(cdtype)  # (1, R+2N, D)
            dt_w = p[3][None].astype(cdtype)  # (1, D, R)
            dt_b = p[4][None].astype(jnp.float32)  # (1, D)
            A = -jnp.exp(p[5][None].astype(jnp.float32))
            d_skip = p[6][None].astype(jnp.float32)
            return mamba_fused_scan(
                xz_dirs[i][:, None], conv_w, conv_b, x_proj, dt_w, dt_b,
                A, d_skip, reverse=reverse,
            )[:, 0]

        g = len(xz_dirs)
        ys = [one(i) for i in range(g - 1 if has_rev else g)]
        if has_rev:
            ys.append(one(g - 1, reverse=True))
        return ys

    def _fused_scan(self, xz_dirs: list[Array], params: list) -> Array:
        """All directions of `mamba_inner_fn_no_out_proj`
        (`selective_scan_interface.py:155-225`) fused into ONE depthwise conv,
        ONE batched projection pair, and ONE grouped Pallas scan: direction g
        occupies channel group g. xz_dirs: list of (B, 2*D_in, L).

        Returns (B, G, D_in, L) per-direction scan outputs.
        """
        cdtype = self.dtype or xz_dirs[0].dtype
        bsz, _, L = xz_dirs[0].shape
        g, d_in = len(xz_dirs), self.d_inner
        r, n = self._dt_rank, self.d_state

        xs, zs = [], []
        for xz in xz_dirs:
            x, z = jnp.split(xz, 2, axis=1)
            xs.append(x)
            zs.append(z)
        x_all = jnp.concatenate(xs, axis=1)  # (B, G*D, L)
        z_all = jnp.concatenate(zs, axis=1)

        conv_w = jnp.concatenate([p[0] for p in params], axis=0).astype(cdtype)
        conv_b = (
            jnp.concatenate([p[1] for p in params], axis=0)
            if params[0][1] is not None
            else None
        )
        x_all = causal_conv1d(x_all, conv_w, conv_b, activation="silu")

        x_proj = jnp.stack([p[2] for p in params]).astype(cdtype)  # (G, R+2N, D)
        dt_w = jnp.stack([p[3] for p in params]).astype(cdtype)  # (G, D, R)
        xg = x_all.reshape(bsz, g, d_in, L)
        x_dbl = jnp.einsum("bgdl,ged->bgel", xg, x_proj)  # (B, G, R+2N, L)
        dt = jnp.einsum("bgrl,gdr->bgdl", x_dbl[:, :, :r], dt_w).reshape(bsz, g * d_in, L)
        Bv = x_dbl[:, :, r : r + n]  # (B, G, N, L)
        Cv = x_dbl[:, :, r + n :]

        A = -jnp.exp(jnp.stack([p[5] for p in params]).astype(jnp.float32)).reshape(
            g * d_in, n
        )
        dt_b = jnp.concatenate([p[4] for p in params]).astype(jnp.float32)
        d_skip = jnp.concatenate([p[6] for p in params]).astype(jnp.float32)

        y = selective_scan(
            x_all, dt, A, Bv, Cv,
            D=d_skip, z=z_all,
            delta_bias=dt_b, delta_softplus=True,
            implementation=self.scan_impl,
        )
        return y.reshape(bsz, g, d_in, L)

    @nn.compact
    def __call__(self, hidden_states: Array):
        """hidden_states: (B, L, d_model). Returns (out, o_fwd, o_bwd, o_slice)
        for v3 (reference `mamba_simple.py:362`), else out alone."""
        batch, seqlen, _ = hidden_states.shape
        d_in = self.d_inner
        cdtype = self.dtype or hidden_states.dtype
        bt = "v3" if self.bimamba_type == "v1" else self.bimamba_type

        in_proj = self.param(
            "in_proj_weight", nn.initializers.lecun_normal(), (2 * d_in, self.d_model)
        )
        x = hidden_states.astype(cdtype)
        xz = jnp.einsum("bld,ed->bel", x, in_proj.astype(cdtype))  # (B, 2*D_in, L)
        if self.bias:
            in_b = self.param("in_proj_bias", nn.initializers.zeros, (2 * d_in,))
            xz = xz + in_b.astype(cdtype)[None, :, None]

        if bt == "v3" and seqlen % self.nslices != 0:
            raise ValueError(
                f"v3 slice scan requires seqlen % nslices == 0, got {seqlen} % {self.nslices}"
            )

        def interleave(v):
            # chunk along L into ns slices, stack, flatten: token (s, l) -> l*ns + s
            # (reference mamba_simple.py:245-247)
            ns = self.nslices
            return (
                v.reshape(batch, v.shape[1], ns, seqlen // ns)
                .transpose(0, 1, 3, 2)
                .reshape(batch, v.shape[1], seqlen)
            )

        def uninterleave(v):
            # inverse interleave (reference mamba_simple.py:263)
            ns = self.nslices
            return (
                v.reshape(batch, v.shape[1], seqlen // ns, ns)
                .transpose(0, 1, 3, 2)
                .reshape(batch, v.shape[1], seqlen)
            )

        # The fused megakernel is a TPU win; in CPU interpret mode it only
        # bloats the jaxpr (the 8-device SPMD dryrun compile went from ~9 min
        # to >50 min with it), so auto-enable on TPU only.
        # An explicit scan_impl="pallas" is honored (A/B isolation knob);
        # only the default (None) auto-upgrades to the megakernel.
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        use_mega = self.scan_impl == "mega" or (
            self.scan_impl is None and on_tpu and self.d_state % 8 == 0
        )
        o_2 = o_3 = None
        if use_mega:
            # direction order: forward[, slice][, reverse] — reverse LAST, fed
            # unflipped (the fused kernel scans it right-to-left in place)
            dirs = [xz]
            params = [self._dir_params("")]
            if bt == "v3":
                # interleave the TOKENS (B, L, d_model) and re-project rather
                # than interleaving the (B, 2*D_in, L) xz: in_proj is
                # per-token, so the results agree — but the permuted copy is
                # expand*2 x smaller and the extra einsum is MXU-cheap
                x_il = (
                    x.reshape(batch, self.nslices, seqlen // self.nslices, -1)
                    .transpose(0, 2, 1, 3)
                    .reshape(batch, seqlen, self.d_model)
                )
                xz_s = jnp.einsum("bld,ed->bel", x_il, in_proj.astype(cdtype))
                if self.bias:
                    xz_s = xz_s + in_b.astype(cdtype)[None, :, None]
                dirs.append(xz_s)
                params.append(self._dir_params("_s"))
            if bt in ("v2", "v3"):
                dirs.append(xz)
                params.append(self._dir_params("_b"))
            ys = self._mega_scan(dirs, params, has_rev=bt in ("v2", "v3"))
            o_1 = ys[0]
            out_dirs = o_1
            if bt == "v3":
                # o_3 is returned un-interleaved (reference mamba_simple.py:263-269);
                # the (B, D_in, L) permuted copy only materialises if the
                # caller keeps it — the out_proj sum below un-interleaves
                # AFTER the projection on the expand*2 x smaller token tensor
                o_3 = uninterleave(ys[1])
            if bt in ("v2", "v3"):
                y_rev = ys[-1]
                out_dirs = out_dirs + y_rev
                # reference-domain (flipped) auxiliary return; XLA removes the
                # flip when the caller drops it (most do)
                o_2 = jnp.flip(y_rev, axis=-1)
        else:
            dirs = [xz]
            params = [self._dir_params("")]
            if bt in ("v2", "v3"):
                dirs.append(jnp.flip(xz, axis=-1))
                params.append(self._dir_params("_b"))
            if bt == "v3":
                dirs.append(interleave(xz))
                params.append(self._dir_params("_s"))

            ys = self._fused_scan(dirs, params)  # (B, G, D_in, L)
            o_1 = ys[:, 0]
            out_dirs = o_1
            if bt in ("v2", "v3"):
                o_2 = ys[:, 1]
                out_dirs = out_dirs + jnp.flip(o_2, axis=-1)
            if bt == "v3":
                o_3 = uninterleave(ys[:, 2])
                out_dirs = out_dirs + o_3

        out_proj = self.param(
            "out_proj_weight", nn.initializers.lecun_normal(), (self.d_model, d_in)
        )
        out = jnp.einsum("bdl,ed->ble", out_dirs, out_proj.astype(cdtype))
        if use_mega and bt == "v3":
            # slice direction: project in its own token domain, un-interleave
            # the (B, L, d_model) result — the permuted copy shrinks by
            # expand*2 vs un-interleaving the (B, D_in, L) scan output
            ns = self.nslices
            o3p = jnp.einsum("bdl,ed->ble", ys[1], out_proj.astype(cdtype))
            out = out + (
                o3p.reshape(batch, seqlen // ns, ns, -1)
                .transpose(0, 2, 1, 3)
                .reshape(batch, seqlen, self.d_model)
            )
        if self.bias:
            out_b = self.param("out_proj_bias", nn.initializers.zeros, (self.d_model,))
            out = out + out_b.astype(cdtype)
        if bt == "v3":
            return out, o_1, o_2, o_3
        return out


class Block(nn.Module):
    """Prenorm residual wrapper: Add -> Norm -> Mixer (reference
    `mamba_simple.py:453-506`). Returns (hidden_states, residual).

    `rms_norm` selects RMSNorm over LayerNorm and `fused_add_norm` runs the
    add+norm in float32 before casting back — the semantics of the reference's
    Triton `layer_norm_fn/rms_norm_fn` (`mamba_ssm/ops/triton/layernorm.py`,
    `Block(fused_add_norm=True)`). On TPU the fusion itself is XLA's job (the
    add, the reduction and the scale all land in one elementwise fusion); the
    flag's observable effect is the fp32 residual arithmetic."""

    dim: int
    norm_epsilon: float = 1e-5
    residual_in_fp32: bool = False
    rms_norm: bool = False
    fused_add_norm: bool = False
    mamba_kwargs: dict = None

    @nn.compact
    def __call__(self, hidden_states: Array, residual: Optional[Array] = None):
        dtype = hidden_states.dtype
        if self.fused_add_norm:
            hs32 = hidden_states.astype(jnp.float32)
            residual = hs32 + residual if residual is not None else hs32
            if not self.residual_in_fp32:
                residual = residual.astype(dtype)
            norm_in = residual.astype(jnp.float32)
        else:
            residual = (
                hidden_states + residual if residual is not None else hidden_states
            )
            if self.residual_in_fp32:
                residual = residual.astype(jnp.float32)
            norm_in = residual
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        h = norm_cls(epsilon=self.norm_epsilon)(norm_in).astype(dtype)
        kw = dict(self.mamba_kwargs or {})
        kw.setdefault("bimamba_type", "none")
        h = Mamba(d_model=self.dim, **kw)(h)
        if isinstance(h, tuple):
            h = h[0]
        return h, residual
