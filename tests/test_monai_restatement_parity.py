"""UNETR / SwinUNETR cross-framework parity (VERDICT r3 item 7).

These two zoo models come from MONAI in the reference
(`/root/reference/src/Unetr/Unetr.py:5`, `src/SwinUNETR/SwinUNETR.py:5`,
config `config.yml:153-179`) and MONAI is not installed in this environment,
so their flax implementations were the only zoo members with no numerical
evidence. Here each is checked against a TORCH restatement of the MONAI
architecture written independently of the flax code (torch conv/linear/
norm modules, manual attention math), with live state_dict conversion via
`torch_convert.unetr_pairs` / `swin_unetr_pairs` — the same harness pattern
as the rest of `test_reference_parity.py`. A shared misreading of tensor
layouts, attention scaling, norm placement or deconv semantics cannot pass.

MONAI-fidelity notes (documented deltas):
- the restatement pins torch defaults (LayerNorm/InstanceNorm eps 1e-5,
  exact-erf GELU, InstanceNorm affine, qkv bias) — MONAI's `qkv_bias=False`
  default is representable by zero biases;
- SwinUNETR window padding: pad tokens here are masked out of attention
  always; timm/MONAI leave them attendable in unshifted windows (a known
  numerical wart at non-window-multiple sizes). The flax model and the
  restatement agree on the cleaner semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _numpy_sd(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


def _t(x):
    return torch.from_numpy(np.asarray(x))


class _ResBlock(tnn.Module):
    """MONAI UnetResBlock: conv-IN-lrelu-conv-IN (+ 1x1-IN residual), lrelu."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.norm1 = tnn.InstanceNorm2d(cout, affine=True, eps=1e-5)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.norm2 = tnn.InstanceNorm2d(cout, affine=True, eps=1e-5)
        self.has_proj = cin != cout
        if self.has_proj:
            self.conv3 = tnn.Conv2d(cin, cout, 1, bias=False)
            self.norm3 = tnn.InstanceNorm2d(cout, affine=True, eps=1e-5)

    def forward(self, x):
        res = self.norm3(self.conv3(x)) if self.has_proj else x
        h = F.leaky_relu(self.norm1(self.conv1(x)), 0.01)
        h = self.norm2(self.conv2(h))
        return F.leaky_relu(h + res, 0.01)


class _ViTBlock(tnn.Module):
    def __init__(self, hidden, heads, mlp_dim):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(hidden)
        self.qkv = tnn.Linear(hidden, 3 * hidden)
        self.out = tnn.Linear(hidden, hidden)
        self.norm2 = tnn.LayerNorm(hidden)
        self.fc1 = tnn.Linear(hidden, mlp_dim)
        self.fc2 = tnn.Linear(mlp_dim, hidden)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        h = self.norm1(x)
        q, k, v = self.qkv(h).chunk(3, dim=-1)
        q = q.view(b, n, self.heads, hd).transpose(1, 2)
        k = k.view(b, n, self.heads, hd).transpose(1, 2)
        v = v.view(b, n, self.heads, hd).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / hd**0.5
        att = att.softmax(dim=-1)
        h = (att @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.out(h)
        m = self.norm2(x)
        m = self.fc2(F.gelu(self.fc1(m)))
        return x + m


class _PrUp(tnn.Module):
    """MONAI UnetrPrUpBlock (conv_block=True, res_block=True)."""

    def __init__(self, cin, cout, num_layer):
        super().__init__()
        self.up0 = tnn.ConvTranspose2d(cin, cout, 2, stride=2)
        self.ups = tnn.ModuleList()
        for _ in range(num_layer):
            mod = tnn.Module()
            mod.deconv = tnn.ConvTranspose2d(cout, cout, 2, stride=2)
            mod.block = _ResBlock(cout, cout)
            self.ups.append(mod)

    def forward(self, x):
        x = self.up0(x)
        for m in self.ups:
            x = m.block(m.deconv(x))
        return x


class _Up(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.deconv = tnn.ConvTranspose2d(cin, cout, 2, stride=2)
        self.block = _ResBlock(2 * cout, cout)

    def forward(self, x, skip):
        return self.block(torch.cat([self.deconv(x), skip], dim=1))


class TorchUNETR2D(tnn.Module):
    """MONAI UNETR (spatial_dims=2) restated in plain torch: ViT with taps at
    layers 3/6/9/12 (12 post-final-norm), progressive deconv skips, UNet
    decoder, 1x1 out head."""

    def __init__(self, in_ch=3, out_ch=1, fs=16, hidden=96, mlp=192, heads=4,
                 layers=12, patch=16):
        super().__init__()
        self.patch = patch
        self.hidden = hidden
        self.patch_embed = tnn.Conv2d(in_ch, hidden, patch, stride=patch)
        self.pos_embed = None  # set lazily per img size in _build_pos
        self.blocks = tnn.ModuleList(
            [_ViTBlock(hidden, heads, mlp) for _ in range(layers)])
        self.norm = tnn.LayerNorm(hidden)
        self.enc1 = _ResBlock(in_ch, fs)
        self.enc2 = _PrUp(hidden, fs * 2, 2)
        self.enc3 = _PrUp(hidden, fs * 4, 1)
        self.enc4 = _PrUp(hidden, fs * 8, 0)
        self.dec3 = _Up(hidden, fs * 8)
        self.dec2 = _Up(fs * 8, fs * 4)
        self.dec1 = _Up(fs * 4, fs * 2)
        self.dec0 = _Up(fs * 2, fs)
        self.out = tnn.Conv2d(fs, out_ch, 1)

    def build_pos(self, hp, wp):
        self.pos_embed = tnn.Parameter(
            torch.randn(1, hp * wp, self.hidden) * 0.02)

    def forward(self, x):
        b, _, H, W = x.shape
        p = self.patch
        hp, wp = H // p, W // p
        t = self.patch_embed(x).flatten(2).transpose(1, 2) + self.pos_embed
        taps = {}
        for i, blk in enumerate(self.blocks, start=1):
            t = blk(t)
            if i in (3, 6, 9):
                taps[i] = t
        taps[12] = self.norm(t)

        def grid(tok):  # (B, N, C) -> (B, C, hp, wp)
            return tok.transpose(1, 2).reshape(b, self.hidden, hp, wp)

        e1 = self.enc1(x)
        e2 = self.enc2(grid(taps[3]))
        e3 = self.enc3(grid(taps[6]))
        e4 = self.enc4(grid(taps[9]))
        d3 = self.dec3(grid(taps[12]), e4)
        d2 = self.dec2(d3, e3)
        d1 = self.dec1(d2, e2)
        d0 = self.dec0(d1, e1)
        return self.out(d0)


@pytest.mark.slow
def test_unetr_vs_torch_restatement():
    from mm_unet_tpu.models.unetr import UNETR
    from mm_unet_tpu.utils import torch_convert as tc

    torch.manual_seed(0)
    fs, hidden, mlp, heads, layers = 16, 96, 192, 4, 12
    tm = TorchUNETR2D(in_ch=3, out_ch=1, fs=fs, hidden=hidden, mlp=mlp,
                      heads=heads, layers=layers)
    size = 96
    tm.build_pos(size // 16, size // 16)
    tm.eval()

    rng = np.random.default_rng(21)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tm(_t(x)).numpy()

    fm = UNETR(in_channels=3, out_channels=1, img_size=size, feature_size=fs,
               hidden_size=hidden, mlp_dim=mlp, num_heads=heads,
               num_layers=layers)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = tc.apply_pairs(
        variables, _numpy_sd(tm) | {"pos_embed": tm.pos_embed.detach().numpy()},
        tc.unetr_pairs(embed=hidden, heads=heads, num_layers=layers))
    got = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# SwinUNETR
# ---------------------------------------------------------------------------


class _WinAttn(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads = heads
        self.window = window
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        n_rel = (2 * window - 1) ** 2
        self.rel_pos_bias = tnn.Parameter(torch.randn(n_rel, heads) * 0.02)
        ws = window
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = flat[:, :, None] - flat[:, None, :] + ws - 1
        self.register_buffer(
            "rel_idx", torch.from_numpy((rel[0] * (2 * ws - 1) + rel[1]).reshape(-1)))

    def forward(self, x, mask):
        bw, n, c = x.shape
        h, hd = self.heads, c // self.heads
        qkv = self.qkv(x).reshape(bw, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = torch.einsum("bnhd,bmhd->bhnm", q, k) / hd**0.5
        bias = self.rel_pos_bias[self.rel_idx].reshape(n, n, h).permute(2, 0, 1)
        att = att + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            att = att.view(bw // nw, nw, h, n, n) + mask[None, :, None]
            att = att.view(bw, h, n, n)
        att = att.softmax(dim=-1)
        out = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(bw, n, c)
        return self.proj(out)


def _t_window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _t_window_reverse(wins, ws, h, w):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class _SwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window = window
        self.shift_cfg = shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _WinAttn(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, 4 * dim)
        self.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):  # (B, H, W, C)
        b, hgt, wdt, c = x.shape
        ws = self.window
        pad_h, pad_w = (-hgt) % ws, (-wdt) % ws
        shortcut = x
        h = self.norm1(x)
        h = F.pad(h, (0, 0, 0, pad_w, 0, pad_h))
        hp, wp = h.shape[1:3]
        shift = self.shift_cfg if min(hp, wp) > ws else 0
        if shift:
            h = torch.roll(h, (-shift, -shift), dims=(1, 2))
        mask = None
        if shift or pad_h or pad_w:
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            sl = ((slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
                  if shift else (slice(None),))
            for hsl in sl:
                for wsl in sl:
                    img_mask[:, hsl, wsl, :] = cnt
                    cnt += 1
            if pad_h:
                img_mask[:, hp - pad_h:, :, :] = cnt + 1
            if pad_w:
                img_mask[:, :, wp - pad_w:, :] = cnt + 2
            mw = _t_window_partition(torch.from_numpy(img_mask), ws).reshape(-1, ws * ws)
            mask = torch.where(mw[:, None, :] != mw[:, :, None],
                               torch.tensor(-1e9), torch.tensor(0.0))
        wins = _t_window_partition(h, ws)
        wins = self.attn(wins, mask)
        h = _t_window_reverse(wins, ws, hp, wp)
        if shift:
            h = torch.roll(h, (shift, shift), dims=(1, 2))
        h = h[:, :hgt, :wdt]
        x = shortcut + h
        m = self.norm2(x)
        return x + self.fc2(F.gelu(self.fc1(m)))


class _Stage(tnn.Module):
    def __init__(self, dim, depth, heads, window):
        super().__init__()
        self.blocks = tnn.ModuleList([
            _SwinBlock(dim, heads, window, 0 if j % 2 == 0 else window // 2)
            for j in range(depth)])
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0, x1 = x[:, 0::2, 0::2], x[:, 1::2, 0::2]
        x2, x3 = x[:, 0::2, 1::2], x[:, 1::2, 1::2]
        merged = self.reduction(self.norm(torch.cat([x0, x1, x2, x3], dim=-1)))
        return x, merged


class _TUp(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.deconv = tnn.ConvTranspose2d(cin, cout, 2, stride=2)
        self.block = _ResBlock(2 * cout, cout)

    def forward(self, x, skip):
        return self.block(torch.cat([self.deconv(x), skip], dim=1))


class TorchSwinUNETR2D(tnn.Module):
    """MONAI SwinUNETR (spatial_dims=2) restated: patch-2 embed, 4 Swin
    stages with patch merging, 5-skip UNETR decoder."""

    def __init__(self, in_ch=3, out_ch=1, fs=12, depths=(2, 2, 2, 2),
                 heads=(3, 6, 12, 24), window=7):
        super().__init__()
        self.patch_embed = tnn.Conv2d(in_ch, fs, 2, stride=2)
        self.stages = tnn.ModuleList()
        dim = fs
        for d, h in zip(depths, heads):
            self.stages.append(_Stage(dim, d, h, window))
            dim *= 2
        self.enc0 = _ResBlock(in_ch, fs)
        self.enc1 = _ResBlock(fs, fs)
        self.enc2 = _ResBlock(2 * fs, 2 * fs)
        self.enc3 = _ResBlock(4 * fs, 4 * fs)
        self.dec4 = _ResBlock(16 * fs, 16 * fs)
        self.skip3 = _ResBlock(8 * fs, 8 * fs)
        self.up0 = _TUp(16 * fs, 8 * fs)
        self.up1 = _TUp(8 * fs, 4 * fs)
        self.up2 = _TUp(4 * fs, 2 * fs)
        self.up3 = _TUp(2 * fs, fs)
        self.up4 = _TUp(fs, fs)
        self.out = tnn.Conv2d(fs, out_ch, 1)

    def forward(self, x):
        h = self.patch_embed(x).permute(0, 2, 3, 1)  # NHWC like the flax side
        hidden = [h]
        for stage in self.stages:
            _, h = stage(h)
            hidden.append(h)

        def chw(t):
            return t.permute(0, 3, 1, 2)

        e0 = self.enc0(x)
        e1 = self.enc1(chw(hidden[0]))
        e2 = self.enc2(chw(hidden[1]))
        e3 = self.enc3(chw(hidden[2]))
        d4 = self.dec4(chw(hidden[4]))
        d3 = self.up0(d4, self.skip3(chw(hidden[3])))
        d2 = self.up1(d3, e3)
        d1 = self.up2(d2, e2)
        d0 = self.up3(d1, e1)
        o = self.up4(d0, e0)
        return self.out(o)


@pytest.mark.slow
def test_swin_unetr_vs_torch_restatement():
    from mm_unet_tpu.models.swin_unetr import SwinUNETR
    from mm_unet_tpu.utils import torch_convert as tc

    torch.manual_seed(0)
    fs, depths, heads = 12, (2, 2, 2, 2), (3, 6, 12, 24)
    tm = TorchSwinUNETR2D(in_ch=3, out_ch=1, fs=fs, depths=depths, heads=heads)
    tm.eval()

    size = 64  # stages 32/16/8/4: exercises window padding AND the
    # small-feature shift=0 fallback
    rng = np.random.default_rng(22)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tm(_t(x)).numpy()

    fm = SwinUNETR(img_size=(size, size), in_channels=3, out_channels=1,
                   feature_size=fs, depths=depths, num_heads=heads,
                   use_checkpoint=False)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = tc.apply_pairs(variables, _numpy_sd(tm),
                               tc.swin_unetr_pairs(feature_size=fs,
                                                   depths=depths,
                                                   num_heads=heads))
    got = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
