"""Torch checkpoint -> flax parameter conversion.

Five reference zoo models warm-start from torch checkpoints
(`pvt_v2_b2/b3.pth`, res2net — `config.yml:81-245`). This module converts a
torch state_dict (loaded with `torch.load(..., map_location='cpu')`) into
this framework's flax parameter trees. Layout rules:

- Conv2d weight (O, I, kH, kW)   -> flax kernel (kH, kW, I, O)
- Depthwise Conv2d (O, 1, kH, kW)-> (kH, kW, 1, O)
- Linear weight (O, I)           -> flax Dense kernel (I, O)
- Norm weight/bias               -> scale/bias unchanged

`load_pvtv2_params` maps a torch PVTv2 state_dict (the reference pvt_v2.py
naming: patch_embed{i}.proj, block{i}.{j}.attn.{q,kv,proj,sr}, .mlp.fc1/fc2/
dwconv, norm{i}) onto `mm_unet_tpu.models.pvtv2.PVTv2` parameters, so
FCBFormer/DuAT/PVT-CASCADE/CVC-UNETR/BMANet can start from the same weights
the reference uses (when the .pth file is present locally).
"""

from __future__ import annotations

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def load_pvtv2_params(flax_params: dict, sd: dict, depths=(3, 4, 6, 3)) -> dict:
    """Returns a copy of `flax_params` (a PVTv2 module's params dict) with
    every tensor that exists in the torch state_dict replaced."""

    def to_mutable(t):
        return (
            {k: to_mutable(s) for k, s in t.items()} if hasattr(t, "items") else t
        )

    p = to_mutable(flax_params)

    def put(dst_path, value):
        node = p
        for k in dst_path[:-1]:
            if k not in node:
                return False
            node = node[k]
        if dst_path[-1] not in node:
            return False
        if node[dst_path[-1]].shape != value.shape:
            return False
        node[dst_path[-1]] = value.astype(node[dst_path[-1]].dtype)
        return True

    n_loaded = 0
    blk_counter = 0
    for i in range(4):
        pe = f"OverlapPatchEmbed_{i}"
        n_loaded += put((pe, "Conv_0", "kernel"), conv_kernel(sd[f"patch_embed{i+1}.proj.weight"])) if f"patch_embed{i+1}.proj.weight" in sd else 0
        for name, key in (("bias", "bias"),):
            if f"patch_embed{i+1}.proj.{key}" in sd:
                n_loaded += put((pe, "Conv_0", name), np.asarray(sd[f"patch_embed{i+1}.proj.{key}"]))
        if f"patch_embed{i+1}.norm.weight" in sd:
            n_loaded += put((pe, "LayerNorm_0", "scale"), np.asarray(sd[f"patch_embed{i+1}.norm.weight"]))
            n_loaded += put((pe, "LayerNorm_0", "bias"), np.asarray(sd[f"patch_embed{i+1}.norm.bias"]))
        for j in range(depths[i]):
            t = f"block{i+1}.{j}"
            f = f"PVTBlock_{blk_counter}"
            blk_counter += 1
            pairs = [
                ((f, "LayerNorm_0", "scale"), f"{t}.norm1.weight", None),
                ((f, "LayerNorm_0", "bias"), f"{t}.norm1.bias", None),
                ((f, "LayerNorm_1", "scale"), f"{t}.norm2.weight", None),
                ((f, "LayerNorm_1", "bias"), f"{t}.norm2.bias", None),
                ((f, "SRAttention_0", "Dense_0", "kernel"), f"{t}.attn.q.weight", dense_kernel),
                ((f, "SRAttention_0", "Dense_0", "bias"), f"{t}.attn.q.bias", None),
                ((f, "SRAttention_0", "Dense_1", "kernel"), f"{t}.attn.kv.weight", dense_kernel),
                ((f, "SRAttention_0", "Dense_1", "bias"), f"{t}.attn.kv.bias", None),
                ((f, "SRAttention_0", "Dense_2", "kernel"), f"{t}.attn.proj.weight", dense_kernel),
                ((f, "SRAttention_0", "Dense_2", "bias"), f"{t}.attn.proj.bias", None),
                ((f, "SRAttention_0", "Conv_0", "kernel"), f"{t}.attn.sr.weight", conv_kernel),
                ((f, "SRAttention_0", "Conv_0", "bias"), f"{t}.attn.sr.bias", None),
                ((f, "SRAttention_0", "LayerNorm_0", "scale"), f"{t}.attn.norm.weight", None),
                ((f, "SRAttention_0", "LayerNorm_0", "bias"), f"{t}.attn.norm.bias", None),
                ((f, "MixFFN_0", "Dense_0", "kernel"), f"{t}.mlp.fc1.weight", dense_kernel),
                ((f, "MixFFN_0", "Dense_0", "bias"), f"{t}.mlp.fc1.bias", None),
                ((f, "MixFFN_0", "Dense_1", "kernel"), f"{t}.mlp.fc2.weight", dense_kernel),
                ((f, "MixFFN_0", "Dense_1", "bias"), f"{t}.mlp.fc2.bias", None),
                ((f, "MixFFN_0", "DWConv_0", "Conv_0", "kernel"), f"{t}.mlp.dwconv.dwconv.weight", conv_kernel),
                ((f, "MixFFN_0", "DWConv_0", "Conv_0", "bias"), f"{t}.mlp.dwconv.dwconv.bias", None),
            ]
            for dst, src, fn in pairs:
                if src in sd:
                    v = np.asarray(sd[src])
                    if fn is not None:
                        v = fn(v)
                    n_loaded += put(dst, v)
        if f"norm{i+1}.weight" in sd:
            n_loaded += put((f"LayerNorm_{i}", "scale"), np.asarray(sd[f"norm{i+1}.weight"]))
            n_loaded += put((f"LayerNorm_{i}", "bias"), np.asarray(sd[f"norm{i+1}.bias"]))
    print(f"load_pvtv2_params: loaded {n_loaded} tensors")
    return p


def load_res2net_params(variables: dict, sd: dict, blocks=(3, 4, 6, 3)) -> dict:
    """Map a Res2Net-50 v1b torch state_dict (reference
    `src/CFANet/CFANet.py:82-263` naming: deep stem `conv1.{0,3,6}`+`bn1`,
    `layer{i}.{j}.{conv1,bn1,convs.k,bns.k,conv3,bn3,downsample.{1,2}}`) onto
    `mm_unet_tpu.models.resnet.Res2Net50Encoder` variables. Fills both the
    `params` (kernel/scale/bias) and `batch_stats` (mean/var) collections.
    Returns a new variables dict; tensors absent from `sd` are left as-is."""

    def to_mutable(t):
        return (
            {k: to_mutable(s) for k, s in t.items()} if hasattr(t, "items") else t
        )

    v = to_mutable(variables)
    params, stats = v["params"], v.get("batch_stats", {})
    n_loaded = 0

    def put_conv(flax_name, torch_key, tree):
        nonlocal n_loaded
        if torch_key in sd and flax_name in tree:
            w = conv_kernel(sd[torch_key])
            if tree[flax_name]["kernel"].shape == w.shape:
                tree[flax_name]["kernel"] = w.astype(tree[flax_name]["kernel"].dtype)
                n_loaded += 1

    def put_bn(flax_name, torch_prefix, ptree, stree):
        nonlocal n_loaded
        for src, dst, tgt in (
            ("weight", "scale", ptree), ("bias", "bias", ptree),
            ("running_mean", "mean", stree), ("running_var", "var", stree),
        ):
            key = f"{torch_prefix}.{src}"
            if key in sd and flax_name in tgt and dst in tgt[flax_name]:
                val = np.asarray(sd[key])
                if tgt[flax_name][dst].shape == val.shape:
                    tgt[flax_name][dst] = val.astype(tgt[flax_name][dst].dtype)
                    n_loaded += 1

    # deep stem: torch conv1.{0,3,6} + bn1 -> flax Conv_0..2 / BatchNorm_0..2
    for fi, tkey in ((0, "conv1.0"), (1, "conv1.3"), (2, "conv1.6")):
        put_conv(f"Conv_{fi}", f"{tkey}.weight", params)
    for fi, tkey in ((0, "conv1.1"), (1, "conv1.4"), (2, "bn1")):
        put_bn(f"BatchNorm_{fi}", tkey, params, stats)

    k = 0
    for i, n in enumerate(blocks):
        for j in range(n):
            t = f"layer{i+1}.{j}"
            f = f"Bottle2neck_{k}"
            k += 1
            if f not in params:
                continue
            bp, bs = params[f], stats.get(f, {})
            put_conv("Conv_0", f"{t}.conv1.weight", bp)
            put_bn("BatchNorm_0", f"{t}.bn1", bp, bs)
            for s in range(3):  # scale-1 = 3 hierarchical 3x3s
                put_conv(f"Conv_{1+s}", f"{t}.convs.{s}.weight", bp)
                put_bn(f"BatchNorm_{1+s}", f"{t}.bns.{s}", bp, bs)
            put_conv("Conv_4", f"{t}.conv3.weight", bp)
            put_bn("BatchNorm_4", f"{t}.bn3", bp, bs)
            put_conv("Conv_5", f"{t}.downsample.1.weight", bp)
            put_bn("BatchNorm_5", f"{t}.downsample.2", bp, bs)
    print(f"load_res2net_params: loaded {n_loaded} tensors")
    return v


# ---------------------------------------------------------------------------
# Generic pair-based full-model converters
#
# A "pair list" maps flax variable paths to torch state_dict keys with a
# layout kind. `apply_pairs` grafts a live torch state_dict onto freshly
# initialised flax variables, verifying shapes; with strict=True it also
# asserts every torch tensor was consumed and every mapped flax leaf existed —
# so a drifted architecture fails loudly instead of silently diverging.
# ---------------------------------------------------------------------------

_KIND_TRANSPOSE = {
    "conv": conv_kernel,                      # torch (O,I,kH,kW) -> (kH,kW,I,O)
    # torch ConvTranspose2d (I,O,kH,kW) -> flax (kH,kW,I,O) with spatial flip
    # (lax.conv_transpose(transpose_kernel=False) does not mirror the taps)
    "convT": lambda w: np.ascontiguousarray(
        np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1]
    ),
    "dense": dense_kernel,                    # (O,I) -> (I,O)
    "raw": np.asarray,                        # copied as-is
    "conv1d_dw": lambda w: np.squeeze(np.asarray(w), 1),  # (D,1,W) -> (D,W)
}


def conv_pairs(fpath, tkey, bias=True):
    p = [((*fpath, "kernel"), f"{tkey}.weight", "conv")]
    if bias:
        p.append(((*fpath, "bias"), f"{tkey}.bias", "raw"))
    return p


def dense_pairs(fpath, tkey, bias=True):
    p = [((*fpath, "kernel"), f"{tkey}.weight", "dense")]
    if bias:
        p.append(((*fpath, "bias"), f"{tkey}.bias", "raw"))
    return p


def norm_pairs(fpath, tkey):
    """LayerNorm/GroupNorm (params only)."""
    return [((*fpath, "scale"), f"{tkey}.weight", "raw"),
            ((*fpath, "bias"), f"{tkey}.bias", "raw")]


def bn_pairs(fpath, tkey):
    """BatchNorm: scale/bias in params, running stats in batch_stats.

    Paths here are given WITHOUT the collection root; `apply_pairs` routes
    mean/var into batch_stats and everything else into params.
    """
    return norm_pairs(fpath, tkey) + [
        ((*fpath, "mean"), f"{tkey}.running_mean", "raw"),
        ((*fpath, "var"), f"{tkey}.running_var", "raw"),
    ]


def apply_pairs(variables, sd: dict, pairs, strict: bool = True):
    """Graft `sd` (numpy state_dict) onto flax `variables` per `pairs`.

    pairs: iterable of (flax_path_tuple, torch_key, kind). Leaf names `mean`
    and `var` route to the `batch_stats` collection, all else to `params`.
    Returns a new (plain-dict) variables pytree.
    """

    def to_mutable(t):
        return {k: to_mutable(s) for k, s in t.items()} if hasattr(t, "items") else t

    v = to_mutable(variables)
    missing_t, missing_f, shape_err = [], [], []
    for fpath, tkey, kind in pairs:
        if tkey not in sd:
            missing_t.append(tkey)
            continue
        fn = _KIND_TRANSPOSE[kind] if isinstance(kind, str) else kind
        val = fn(sd[tkey])
        coll = "batch_stats" if fpath[-1] in ("mean", "var") else "params"
        node = v.get(coll, {})
        ok = True
        for k in fpath[:-1]:
            if not isinstance(node, dict) or k not in node:
                ok = False
                break
            node = node[k]
        if not ok or not isinstance(node, dict) or fpath[-1] not in node:
            missing_f.append((coll,) + fpath)
            continue
        old = node[fpath[-1]]
        if tuple(old.shape) != tuple(val.shape):
            shape_err.append((tkey, tuple(val.shape), (coll,) + fpath, tuple(old.shape)))
            continue
        node[fpath[-1]] = val.astype(np.asarray(old).dtype)
    if strict and (missing_t or missing_f or shape_err):
        raise ValueError(
            f"apply_pairs mismatch: missing torch keys {missing_t[:5]}, "
            f"missing flax paths {missing_f[:5]}, shape errors {shape_err[:5]} "
            f"(counts: {len(missing_t)}/{len(missing_f)}/{len(shape_err)})"
        )
    return v


def double_conv_pairs(fpath, tkey):
    """Reference `unet_parts.py::DoubleConv` (Sequential conv/bn/relu x2)."""
    return (
        conv_pairs((*fpath, "Conv_0"), f"{tkey}.0", bias=False)
        + bn_pairs((*fpath, "BatchNorm_0"), f"{tkey}.1")
        + conv_pairs((*fpath, "Conv_1"), f"{tkey}.3", bias=False)
        + bn_pairs((*fpath, "BatchNorm_1"), f"{tkey}.4")
    )


def unet_pairs(bilinear: bool = True):
    """Map `mm_unet_tpu.models.unet.UNet` <- reference `src/Unet/Unet.py`."""
    pairs = double_conv_pairs(("DoubleConv_0",), "inc.double_conv")
    for i in range(1, 5):
        pairs += double_conv_pairs(
            (f"DoubleConv_{i}",), f"down{i}.maxpool_conv.1.double_conv"
        )
    for i in range(4):
        up = (f"Up_{i}",)
        if not bilinear:
            pairs += [((*up, "ConvTranspose_0", "kernel"), f"up{i+1}.up.weight", "convT"),
                      ((*up, "ConvTranspose_0", "bias"), f"up{i+1}.up.bias", "raw")]
        pairs += double_conv_pairs((*up, "DoubleConv_0"), f"up{i+1}.conv.double_conv")
    pairs += conv_pairs(("Conv_0",), "outc.conv")
    return pairs


def convnext_block_pairs(fpath, tkey):
    """Reference `ConvNeXt.py::Conv` (dwconv/norm1/pwconv1/pwconv2/norm2)."""
    return (
        conv_pairs((*fpath, "Conv_0"), f"{tkey}.dwconv")
        + bn_pairs((*fpath, "BatchNorm_0"), f"{tkey}.norm1")
        + dense_pairs((*fpath, "Dense_0"), f"{tkey}.pwconv1")
        + dense_pairs((*fpath, "Dense_1"), f"{tkey}.pwconv2")
        + bn_pairs((*fpath, "BatchNorm_1"), f"{tkey}.norm2")
    )


def convunext_pairs(bilinear: bool = True):
    """Map `mm_unet_tpu.models.convunext.ConvUNeXt` <- reference
    `src/ConvUneXt/ConvNeXt.py::ConvUNeXt`."""
    pairs = conv_pairs(("Conv_0",), "in_conv.0")
    pairs += bn_pairs(("BatchNorm_0",), "in_conv.1")
    pairs += convnext_block_pairs(("ConvNeXtBlock_0",), "in_conv.3")
    layer_nums = (1, 1, 3, 1)
    for i in range(4):
        d = (f"Down_{i}",)
        pairs += bn_pairs((*d, "BatchNorm_0"), f"down{i+1}.0")
        pairs += conv_pairs((*d, "Conv_0"), f"down{i+1}.1")
        for j in range(layer_nums[i]):
            pairs += convnext_block_pairs((*d, f"ConvNeXtBlock_{j}"), f"down{i+1}.{2+j}")
    for i in range(4):
        u = (f"Up_{i}",)
        pairs += bn_pairs((*u, "BatchNorm_0"), f"up{i+1}.norm")
        if not bilinear:
            pairs += [((*u, "ConvTranspose_0", "kernel"), f"up{i+1}.up.weight", "convT"),
                      ((*u, "ConvTranspose_0", "bias"), f"up{i+1}.up.bias", "raw")]
        pairs += dense_pairs((*u, "Dense_0"), f"up{i+1}.gate")
        pairs += dense_pairs((*u, "Dense_1"), f"up{i+1}.linear1")
        pairs += dense_pairs((*u, "Dense_2"), f"up{i+1}.linear2")
        pairs += conv_pairs((*u, "Conv_0"), f"up{i+1}.conv1x1")
        pairs += convnext_block_pairs((*u, "ConvNeXtBlock_0"), f"up{i+1}.conv.0")
    pairs += conv_pairs(("Conv_1",), "out_conv.0")
    return pairs


def bnprelu_pairs(fpath, tkey):
    """Reference `CFPnet.py::BNPReLU` (BatchNorm eps=1e-3 + PReLU)."""
    return bn_pairs((*fpath, "BatchNorm_0"), f"{tkey}.bn") + [
        ((*fpath, "PReLU_0", "alpha"), f"{tkey}.acti.weight", "raw")
    ]


def _cfp_conv_pairs(fpath, tkey, bn=True):
    """Reference `CFPnet.py::Conv` wrapper (conv [+ BNPReLU])."""
    p = [((*fpath, "Conv_0", "kernel"), f"{tkey}.conv.weight", "conv")]
    if bn:
        p += bnprelu_pairs((*fpath, "BNPReLU_0"), f"{tkey}.bn_prelu")
    return p


def cfp_module_pairs(fp, tk):
    p = bnprelu_pairs((*fp, "BNPReLU_0"), f"{tk}.bn_relu_1")
    p += _cfp_conv_pairs((*fp, "ConvBA_0"), f"{tk}.conv1x1_1")
    i = 1
    for b in range(1, 5):
        for j in range(1, 4):
            p += _cfp_conv_pairs((*fp, f"ConvBA_{i}"), f"{tk}.dconv3x1_{b}_{j}")
            i += 1
            p += _cfp_conv_pairs((*fp, f"ConvBA_{i}"), f"{tk}.dconv1x3_{b}_{j}")
            i += 1
    p += bnprelu_pairs((*fp, "BNPReLU_1"), f"{tk}.bn_relu_2")
    p += _cfp_conv_pairs((*fp, f"ConvBA_{i}"), f"{tk}.conv1x1", bn=False)
    return p


def cfpnet_pairs(block_1: int = 2, block_2: int = 6):
    """Map `mm_unet_tpu.models.cfpnet.CFPNet` <- reference `src/CFPnet/CFPnet.py`."""
    p = []
    for i in range(3):
        p += _cfp_conv_pairs((f"ConvBA_{i}",), f"init_conv.{i}")
    p += bnprelu_pairs(("BNPReLU_0",), "bn_prelu_1")
    p += _cfp_conv_pairs(("DownSamplingBlock_0", "ConvBA_0"), "downsample_1.conv3x3", bn=False)
    p += bnprelu_pairs(("DownSamplingBlock_0", "BNPReLU_0"), "downsample_1.bn_prelu")
    for i in range(block_1):
        p += cfp_module_pairs((f"CFPModule_{i}",), f"CFP_Block_1.CFP_Module_1_{i}")
    p += bnprelu_pairs(("BNPReLU_1",), "bn_prelu_2")
    p += _cfp_conv_pairs(("DownSamplingBlock_1", "ConvBA_0"), "downsample_2.conv3x3", bn=False)
    p += bnprelu_pairs(("DownSamplingBlock_1", "BNPReLU_0"), "downsample_2.bn_prelu")
    for i in range(block_2):
        p += cfp_module_pairs((f"CFPModule_{block_1 + i}",), f"CFP_Block_2.CFP_Module_2_{i}")
    p += bnprelu_pairs(("BNPReLU_2",), "bn_prelu_3")
    p += _cfp_conv_pairs(("ConvBA_3",), "classifier.0", bn=False)
    return p


def _transunet_qkv(E: int, h: int):
    """Reference TransUNet splits the fused qkv features as `(d k h)` with d
    slowest (`TransUnet.py:20`); the rebuild uses `(k h d)`. Permute the
    torch weight rows accordingly when converting."""
    d = E // h
    di, ki, hi = np.meshgrid(np.arange(d), np.arange(3), np.arange(h),
                             indexing="ij")
    f = (di * 3 + ki) * h + hi  # torch row for (d_i, k_i, h_i)
    g = (ki * h + hi) * d + di  # flax column
    perm = np.empty(3 * E, dtype=np.int64)
    perm[g.ravel()] = f.ravel()

    def convert(w):
        return np.transpose(np.asarray(w), (1, 0))[:, perm]

    return convert


def transunet_pairs(embedding_dim: int, head_num: int, block_num: int = 8):
    """Map `mm_unet_tpu.models.transunet.TransUNet` <- reference
    `src/TransUnet/TransUnet.py`."""
    p = conv_pairs(("Conv_0",), "encoder.conv1", bias=False)
    p += bn_pairs(("BatchNorm_0",), "encoder.norm1")
    for i in range(3):
        e, t = (f"EncoderBottleneck_{i}",), f"encoder.encoder{i+1}"
        p += conv_pairs((*e, "Conv_0"), f"{t}.downsample.0", bias=False)
        p += bn_pairs((*e, "BatchNorm_0"), f"{t}.downsample.1")
        for j in range(3):
            p += conv_pairs((*e, f"Conv_{j+1}"), f"{t}.conv{j+1}", bias=False)
            p += bn_pairs((*e, f"BatchNorm_{j+1}"), f"{t}.norm{j+1}")
    v = ("ViT_0",)
    p += dense_pairs((*v, "Dense_0"), "encoder.vit.projection")
    p += [((*v, "cls_token"), "encoder.vit.cls_token", "raw"),
          ((*v, "embedding"), "encoder.vit.embedding", "raw")]
    qkv = _transunet_qkv(embedding_dim, head_num)
    for i in range(block_num):
        b, t = (*v, f"TransformerEncoderBlock_{i}"), f"encoder.vit.transformer.layer_blocks.{i}"
        p += [((*b, "MultiHeadAttention_0", "Dense_0", "kernel"),
               f"{t}.multi_head_attention.qkv_layer.weight", qkv)]
        p += dense_pairs((*b, "MultiHeadAttention_0", "Dense_1"),
                         f"{t}.multi_head_attention.out_attention", bias=False)
        p += norm_pairs((*b, "LayerNorm_0"), f"{t}.layer_norm1")
        p += dense_pairs((*b, "Dense_0"), f"{t}.mlp.mlp_layers.0")
        p += dense_pairs((*b, "Dense_1"), f"{t}.mlp.mlp_layers.3")
        p += norm_pairs((*b, "LayerNorm_1"), f"{t}.layer_norm2")
    p += conv_pairs(("Conv_1",), "encoder.conv2")
    p += bn_pairs(("BatchNorm_1",), "encoder.norm2")
    for i in range(4):
        dpath, t = (f"DecoderBottleneck_{i}",), f"decoder.decoder{i+1}"
        p += conv_pairs((*dpath, "Conv_0"), f"{t}.layer.0")
        p += bn_pairs((*dpath, "BatchNorm_0"), f"{t}.layer.1")
        p += conv_pairs((*dpath, "Conv_1"), f"{t}.layer.3")
        p += bn_pairs((*dpath, "BatchNorm_1"), f"{t}.layer.4")
    p += conv_pairs(("Conv_2",), "decoder.conv1")
    return p


def mamba_pairs(fpath, tkey, d_model, dirs=("", "_b", "_s")):
    """TFM Mamba module (reference `requirements/mamba_simple.py`): the flax
    params mirror the torch names; `dt_proj*_weight` is stored shifted by
    +dt_rank^-0.5 (the flax module subtracts it at call time, mamba.py:119)."""
    import math

    r = math.ceil(d_model / 16)
    shift = r ** -0.5

    def dt_shift(w):
        return np.asarray(w) + shift

    p = [((*fpath, "in_proj_weight"), f"{tkey}.in_proj.weight", "raw"),
         ((*fpath, "out_proj_weight"), f"{tkey}.out_proj.weight", "raw")]
    for s in dirs:
        p += [
            ((*fpath, f"conv1d{s}_weight"), f"{tkey}.conv1d{s}.weight", "conv1d_dw"),
            ((*fpath, f"conv1d{s}_bias"), f"{tkey}.conv1d{s}.bias", "raw"),
            ((*fpath, f"x_proj{s}_weight"), f"{tkey}.x_proj{s}.weight", "raw"),
            ((*fpath, f"dt_proj{s}_weight"), f"{tkey}.dt_proj{s}.weight", dt_shift),
            ((*fpath, f"dt_proj{s}_bias"), f"{tkey}.dt_proj{s}.bias", "raw"),
            ((*fpath, f"A{s}_log"), f"{tkey}.A{s}_log", "raw"),
            ((*fpath, f"D{s}"), f"{tkey}.D{s}", "raw"),
        ]
    return p


def mmconv_pairs(fpath, tkey, kernel_size=3, morph=0):
    """Reference `MMUNet.py::MMConv` (offset conv + GN + TFM Mamba + morph
    conv + GN). Only the morph-selected dsc conv is mapped (both exist in the
    torch state_dict; the other is architecturally dead)."""
    p = conv_pairs((*fpath, "Conv_0"), f"{tkey}.offset_conv")
    p += norm_pairs((*fpath, "GroupNorm_0"), f"{tkey}.gn_offset")
    p += mamba_pairs((*fpath, "mamba"), f"{tkey}.mamba", kernel_size)
    p += [((*fpath, "altho"), f"{tkey}.altho", "raw")]
    dsc = "dsc_conv_x" if morph == 0 else "dsc_conv_y"
    p += conv_pairs((*fpath, dsc), f"{tkey}.{dsc}")
    p += norm_pairs((*fpath, "GroupNorm_1"), f"{tkey}.gn")
    return p


def _residual_pairs(fpath, tkey, downsample=False):
    if downsample:
        return (
            conv_pairs((*fpath, "Conv_0"), f"{tkey}.block1.0", bias=False)
            + bn_pairs((*fpath, "BatchNorm_0"), f"{tkey}.block1.1")
            + mmconv_pairs((*fpath, "MMConv_0"), f"{tkey}.block1.3")
            + bn_pairs((*fpath, "BatchNorm_1"), f"{tkey}.block1.4")
            + conv_pairs((*fpath, "Conv_1"), f"{tkey}.block2.0", bias=False)
            + bn_pairs((*fpath, "BatchNorm_2"), f"{tkey}.block2.1")
        )
    return (
        mmconv_pairs((*fpath, "MMConv_0"), f"{tkey}.block1.0")
        + bn_pairs((*fpath, "BatchNorm_0"), f"{tkey}.block1.1")
        + mmconv_pairs((*fpath, "MMConv_1"), f"{tkey}.block1.3")
        + bn_pairs((*fpath, "BatchNorm_1"), f"{tkey}.block1.4")
    )


def mm_net_pairs(depths=(3, 4, 6, 3)):
    """Map `mm_unet_tpu.models.mm_unet.MM_Net` <- reference
    `src/UM_Net/MMUNet.py::MM_Net` (full model, all MMConv/Mamba weights)."""
    p = conv_pairs(("Conv_0",), "encoder1.0", bias=False)
    p += bn_pairs(("BatchNorm_0",), "encoder1.1")
    rb = 0
    for stage, depth in enumerate(depths):
        for j in range(depth):
            p += _residual_pairs(
                (f"ResidualBlock_{rb}",), f"encoder{stage + 2}.{j}",
                downsample=(stage > 0 and j == 0),
            )
            rb += 1
    for i in range(3):
        p += mmconv_pairs((f"MMConv_{i}",), f"down{i + 3}.0", kernel_size=1)
        p += bn_pairs((f"BatchNorm_{i + 1}",), f"down{i + 3}.1")

    def decoder_pairs(fp, tk):
        return (
            mmconv_pairs((*fp, "MMConv_0"), f"{tk}.conv1.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv1.1")
            + mmconv_pairs((*fp, "MMConv_1"), f"{tk}.conv2.0")
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.conv2.1")
        )

    def sideout_pairs(fp, tk):
        return (
            mmconv_pairs((*fp, "MMConv_0"), f"{tk}.conv1.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv1.1")
            + conv_pairs((*fp, "Conv_0"), f"{tk}.conv2")
        )

    def rcg_pairs(fp, tk):
        return (
            mmconv_pairs((*fp, "MMConv_0"), f"{tk}.conv1.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv1.1")
            + [((*fp, "ConvTranspose_0", "kernel"), f"{tk}.upsample.weight", "convT"),
               ((*fp, "ConvTranspose_0", "bias"), f"{tk}.upsample.bias", "raw")]
            + mamba_pairs((*fp, "mamba"), f"{tk}.mamba", 64)
            + conv_pairs((*fp, "Conv_0"), f"{tk}.downsample")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.mlp.0")
        )

    # decoder5/side5 run first in the rebuild's call order
    p += decoder_pairs(("DecoderBlock_0",), "decoder5")
    p += sideout_pairs(("SideoutBlock_0",), "side5")
    # contour branch: cbam Sequential [conv, bn, relu, CBAM, conv, bn, relu]
    p += conv_pairs(("Conv_1",), "cbam.0")
    p += bn_pairs(("BatchNorm_4",), "cbam.1")
    p += conv_pairs(("CBAM_0", "Conv_0"), "cbam.3.mlp.0", bias=False)
    p += conv_pairs(("CBAM_0", "Conv_1"), "cbam.3.mlp.2", bias=False)
    p += conv_pairs(("CBAM_0", "Conv_2"), "cbam.3.conv", bias=False)
    p += conv_pairs(("Conv_2",), "cbam.4")
    p += bn_pairs(("BatchNorm_5",), "cbam.5")
    p += conv_pairs(("Conv_3",), "line_predict")
    # cascade: RCG_0/1/2 = rcg4/rcg3/rcg2, Sideout_1..3 = side4/3/2
    for i, n in enumerate((4, 3, 2)):
        p += rcg_pairs((f"RCG_{i}",), f"rcg{n}")
        p += decoder_pairs((f"DecoderBlock_{i + 1}",), f"decoder{n}")
        p += sideout_pairs((f"SideoutBlock_{i + 1}",), f"side{n}")
    return p


def dsconv_pairs(fpath, tkey, morph=0):
    """Reference `src/UM_Net/DSC_conv.py::DSConv_pro` (offset conv + GN +
    deform sample + morph conv + GN). Only the morph-selected dsc conv is
    mapped (both exist in the torch state_dict; the other is dead)."""
    dsc = "dsc_conv_x" if morph == 0 else "dsc_conv_y"
    pre = f"{tkey}." if tkey else ""
    return (
        conv_pairs((*fpath, "Conv_0"), f"{pre}offset_conv")
        + norm_pairs((*fpath, "GroupNorm_0"), f"{pre}gn_offset")
        + conv_pairs((*fpath, dsc), f"{pre}{dsc}")
        + norm_pairs((*fpath, "GroupNorm_1"), f"{pre}gn")
    )


def resnet34_encoder_pairs(fpath=("ResNet34Encoder_0",), tprefix=""):
    """Map `mm_unet_tpu.models.resnet.ResNet34Encoder` <- a torchvision-shaped
    resnet34 state_dict living under `tprefix` (e.g. `encoder2` == `layer1`
    when the reference unpacks the torchvision module, `UM_Net.py:433-440`)."""
    t = lambda k: f"{tprefix}{k}" if tprefix else k
    p = conv_pairs((*fpath, "Conv_0"), t("conv1"), bias=False)
    p += bn_pairs((*fpath, "BatchNorm_0"), t("bn1"))
    bi = 0
    for stage, depth in enumerate((3, 4, 6, 3)):
        for j in range(depth):
            fb = (*fpath, f"BasicBlock_{bi}")
            tb = t(f"layer{stage + 1}.{j}")
            p += conv_pairs((*fb, "Conv_0"), f"{tb}.conv1", bias=False)
            p += bn_pairs((*fb, "BatchNorm_0"), f"{tb}.bn1")
            p += conv_pairs((*fb, "Conv_1"), f"{tb}.conv2", bias=False)
            p += bn_pairs((*fb, "BatchNorm_1"), f"{tb}.bn2")
            if stage > 0 and j == 0:
                p += conv_pairs((*fb, "Conv_2"), f"{tb}.downsample.0", bias=False)
                p += bn_pairs((*fb, "BatchNorm_2"), f"{tb}.downsample.1")
            bi += 1
    return p


def um_net_pairs():
    """Map `mm_unet_tpu.models.um_net.UM_Net` <- reference
    `src/UM_Net/UM_Net.py:423-530` (the active torchvision-resnet34 variant).

    The reference unpacks a torchvision resnet34 into `encoder1_conv/
    encoder1_bn/encoder2..5`; decoders/side-outs/RCGs use DSConv_pro."""
    # encoder: the reference renames resnet attrs, so map stage by stage
    enc = ("ResNet34Encoder_0",)
    p = conv_pairs((*enc, "Conv_0"), "encoder1_conv", bias=False)
    p += bn_pairs((*enc, "BatchNorm_0"), "encoder1_bn")
    bi = 0
    for stage, depth in enumerate((3, 4, 6, 3)):
        for j in range(depth):
            fb = (*enc, f"BasicBlock_{bi}")
            tb = f"encoder{stage + 2}.{j}"
            p += conv_pairs((*fb, "Conv_0"), f"{tb}.conv1", bias=False)
            p += bn_pairs((*fb, "BatchNorm_0"), f"{tb}.bn1")
            p += conv_pairs((*fb, "Conv_1"), f"{tb}.conv2", bias=False)
            p += bn_pairs((*fb, "BatchNorm_1"), f"{tb}.bn2")
            if stage > 0 and j == 0:
                p += conv_pairs((*fb, "Conv_2"), f"{tb}.downsample.0", bias=False)
                p += bn_pairs((*fb, "BatchNorm_2"), f"{tb}.downsample.1")
            bi += 1
    # down3/4/5 1x1 reducers
    for i in range(3):
        p += conv_pairs((f"Conv_{i}",), f"down{i + 3}.0")
        p += bn_pairs((f"BatchNorm_{i}",), f"down{i + 3}.1")

    def decoder_pairs(fp, tk):
        return (
            dsconv_pairs((*fp, "DSConv_0"), f"{tk}.conv1.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv1.1")
            + dsconv_pairs((*fp, "DSConv_1"), f"{tk}.conv2.0")
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.conv2.1")
        )

    def sideout_pairs(fp, tk):
        return (
            dsconv_pairs((*fp, "DSConv_0"), f"{tk}.conv1.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv1.1")
            + conv_pairs((*fp, "Conv_0"), f"{tk}.conv2")
        )

    def rcg_pairs(fp, tk):
        return (
            dsconv_pairs((*fp, "DSConv_0"), f"{tk}.conv1.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv1.1")
            + [((*fp, "ConvTranspose_0", "kernel"), f"{tk}.upsample.weight", "convT"),
               ((*fp, "ConvTranspose_0", "bias"), f"{tk}.upsample.bias", "raw")]
            + mamba_pairs((*fp, "mamba"), f"{tk}.mamba", 64, dirs=("",))
            + conv_pairs((*fp, "Conv_0"), f"{tk}.downsample")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.mlp.0")
        )

    p += decoder_pairs(("DecoderBlock_0",), "decoder5")
    p += sideout_pairs(("SideoutBlock_0",), "side5")
    # contour branch: cbam Sequential [conv, bn, relu, CBAM, conv, bn, relu]
    p += conv_pairs(("Conv_3",), "cbam.0")
    p += bn_pairs(("BatchNorm_3",), "cbam.1")
    p += conv_pairs(("CBAM_0", "Conv_0"), "cbam.3.mlp.0", bias=False)
    p += conv_pairs(("CBAM_0", "Conv_1"), "cbam.3.mlp.2", bias=False)
    p += conv_pairs(("CBAM_0", "Conv_2"), "cbam.3.conv", bias=False)
    p += conv_pairs(("Conv_4",), "cbam.4")
    p += bn_pairs(("BatchNorm_4",), "cbam.5")
    p += conv_pairs(("Conv_5",), "line_predict")
    # cascade: RCG_0/1/2 = rcg4/rcg3/rcg2, blocks numbered in call order
    for i, n in enumerate((4, 3, 2)):
        p += rcg_pairs((f"RCG_{i}",), f"rcg{n}")
        p += decoder_pairs((f"DecoderBlock_{i + 1}",), f"decoder{n}")
        p += sideout_pairs((f"SideoutBlock_{i + 1}",), f"side{n}")
    # HPPF head + final Sequential [conv, bn, relu, dropout, conv]
    hp = ("HPPF_0",)
    p += dsconv_pairs((*hp, "DSConv_0"), "hpp.conv1.0")
    p += conv_pairs((*hp, "Conv_0"), "hpp.conv2.0")
    p += conv_pairs((*hp, "Conv_1"), "hpp.mlp.0")
    p += conv_pairs((*hp, "Conv_2"), "hpp.mlp.2")
    p += conv_pairs((*hp, "Conv_3"), "hpp.feat_conv.0")
    p += bn_pairs((*hp, "BatchNorm_0"), "hpp.feat_conv.1")
    p += conv_pairs(("Conv_6",), "final.0")
    p += bn_pairs(("BatchNorm_5",), "final.1")
    p += conv_pairs(("Conv_7",), "final.4")
    return p


def pvtv2_block_pairs(fblk, tkey, sr_ratio):
    """One PVTv2 encoder block (reference `src/FCBFormer/pvt_v2.py::Block`):
    prenorm SR-attention + prenorm Mix-FFN with depthwise 3x3. The spatial
    -reduction conv/norm exist only when sr_ratio > 1 (`pvt_v2.py:74-77`)."""
    at = (*fblk, "SRAttention_0")
    p = (
        norm_pairs((*fblk, "LayerNorm_0"), f"{tkey}.norm1")
        + norm_pairs((*fblk, "LayerNorm_1"), f"{tkey}.norm2")
        + dense_pairs((*at, "Dense_0"), f"{tkey}.attn.q")
        + dense_pairs((*at, "Dense_1"), f"{tkey}.attn.kv")
        + dense_pairs((*at, "Dense_2"), f"{tkey}.attn.proj")
        + dense_pairs((*fblk, "MixFFN_0", "Dense_0"), f"{tkey}.mlp.fc1")
        + dense_pairs((*fblk, "MixFFN_0", "Dense_1"), f"{tkey}.mlp.fc2")
        + conv_pairs((*fblk, "MixFFN_0", "DWConv_0", "Conv_0"), f"{tkey}.mlp.dwconv.dwconv")
    )
    if sr_ratio > 1:
        p += conv_pairs((*at, "Conv_0"), f"{tkey}.attn.sr")
        p += norm_pairs((*at, "LayerNorm_0"), f"{tkey}.attn.norm")
    return p


def pvtv2_pairs(fpath, pe_key, blk_key, norm_key, depths=(3, 4, 6, 3),
                sr_ratios=(8, 4, 2, 1)):
    """Full PVTv2 backbone pair list. `pe_key(i)` / `blk_key(i, j)` /
    `norm_key(i)` produce the torch key prefixes, so the same generator covers
    attribute-named backbones (`backbone.patch_embed1...`, DuAT-style) and
    Sequential-flattened ones (`TB.backbone.0...`, FCBFormer `models.py:129`).
    """
    p = []
    bi = 0
    for i in range(4):
        pe = (*fpath, f"OverlapPatchEmbed_{i}")
        p += conv_pairs((*pe, "Conv_0"), f"{pe_key(i)}.proj")
        p += norm_pairs((*pe, "LayerNorm_0"), f"{pe_key(i)}.norm")
        for j in range(depths[i]):
            p += pvtv2_block_pairs((*fpath, f"PVTBlock_{bi}"), blk_key(i, j),
                                   sr_ratios[i])
            bi += 1
        p += norm_pairs((*fpath, f"LayerNorm_{i}"), norm_key(i))
    return p


def rb_pairs(fpath, tkey, skip=False):
    """FCBFormer residual block (`src/FCBFormer/models.py:10-34`): GN/SiLU/conv
    twice + optional 1x1 skip (torch uses Identity when channels match)."""
    p = (
        norm_pairs((*fpath, "GroupNorm_0"), f"{tkey}.in_layers.0")
        + conv_pairs((*fpath, "Conv_0"), f"{tkey}.in_layers.2")
        + norm_pairs((*fpath, "GroupNorm_1"), f"{tkey}.out_layers.0")
        + conv_pairs((*fpath, "Conv_1"), f"{tkey}.out_layers.2")
    )
    if skip:
        p += conv_pairs((*fpath, "Conv_2"), f"{tkey}.skip")
    return p


def fcbformer_pairs(depths=(3, 4, 18, 3)):
    """Map `mm_unet_tpu.models.fcbformer.FCBFormer` <- reference
    `src/FCBFormer/models.py:177-196`: TB (PVTv2-b3 flattened into a
    Sequential, LE/SFA residual blocks), FCB encoder/decoder, PH head."""
    tb = ("TB_0",)
    p = pvtv2_pairs(
        (*tb, "PVTv2_0"),
        pe_key=lambda i: f"TB.backbone.{3 * i}",
        blk_key=lambda i, j: f"TB.backbone.{3 * i + 1}.{j}",
        norm_key=lambda i: f"TB.backbone.{3 * i + 2}",
        depths=depths,
    )
    dims = (64, 128, 320, 512)
    ri = 0
    for i in range(4):  # LE: RB(dim->64), RB(64->64), Upsample
        p += rb_pairs((*tb, f"RB_{ri}"), f"TB.LE.{i}.0", skip=dims[i] != 64)
        p += rb_pairs((*tb, f"RB_{ri + 1}"), f"TB.LE.{i}.1")
        ri += 2
    for i in (2, 1, 0):  # SFA applied top-down (`models.py:169-172`)
        p += rb_pairs((*tb, f"RB_{ri}"), f"TB.SFA.{i}.0", skip=True)  # 128->64
        p += rb_pairs((*tb, f"RB_{ri + 1}"), f"TB.SFA.{i}.1")
        ri += 2

    fcb = ("FCB_0",)
    mc, mults = 32, (1, 1, 2, 2, 4, 4)
    p += conv_pairs((*fcb, "Conv_0"), "FCB.enc_blocks.0")
    ti, rb, cv, ch = 1, 0, 1, mc
    enc_chans = [mc]
    for level in range(6):
        for _ in range(2):
            out = mults[level] * mc
            p += rb_pairs((*fcb, f"RB_{rb}"), f"FCB.enc_blocks.{ti}.0",
                          skip=ch != out)
            ch = out
            enc_chans.append(ch)
            rb += 1
            ti += 1
        if level != 5:
            p += conv_pairs((*fcb, f"Conv_{cv}"), f"FCB.enc_blocks.{ti}.0")
            enc_chans.append(ch)
            cv += 1
            ti += 1
    p += rb_pairs((*fcb, f"RB_{rb}"), "FCB.middle_block.0")
    p += rb_pairs((*fcb, f"RB_{rb + 1}"), "FCB.middle_block.1")
    rb += 2
    ti = 0
    for level in range(6):
        mult = mults[::-1][level]
        for block in range(3):
            out = mult * mc
            p += rb_pairs((*fcb, f"RB_{rb}"), f"FCB.dec_blocks.{ti}.0",
                          skip=(ch + enc_chans.pop()) != out)
            ch = out
            rb += 1
            if level < 5 and block == 2:
                p += conv_pairs((*fcb, f"Conv_{cv}"), f"FCB.dec_blocks.{ti}.1.1")
                cv += 1
            ti += 1

    p += rb_pairs(("RB_0",), "PH.0", skip=True)  # 96 -> 64
    p += rb_pairs(("RB_1",), "PH.1")
    p += conv_pairs(("Conv_0",), "PH.2")
    return p


def basic_conv2d_pairs(fpath, tkey):
    """DuAT `BasicConv2d` (conv no-bias + BN + ReLU, `DuAT.py:18-32`)."""
    return (conv_pairs((*fpath, "Conv_0"), f"{tkey}.conv", bias=False)
            + bn_pairs((*fpath, "BatchNorm_0"), f"{tkey}.bn"))


def duat_pairs(depths=(3, 4, 6, 3)):
    """Map `mm_unet_tpu.models.duat.DuAT` <- reference `src/DuAT/DuAT.py:
    329-372`: attribute-named PVTv2-b2 backbone, GLSA x3 (ConvBranch +
    ContextBlock), fuse/fuse2 heads, SBA boundary aggregation."""
    p = pvtv2_pairs(
        ("PVTv2_0",),
        pe_key=lambda i: f"backbone.patch_embed{i + 1}",
        blk_key=lambda i, j: f"backbone.block{i + 1}.{j}",
        norm_key=lambda i: f"backbone.norm{i + 1}",
        depths=depths,
    )

    def conv_branch_pairs(fp, tk):
        q = []
        for i in range(6):  # conv1..conv6: conv(no bias) + BN
            q += conv_pairs((*fp, f"Conv_{i}"), f"{tk}.conv{i + 1}.0", bias=False)
            q += bn_pairs((*fp, f"BatchNorm_{i}"), f"{tk}.conv{i + 1}.1")
        q += conv_pairs((*fp, "Conv_6"), f"{tk}.conv7.0", bias=False)
        return q

    def context_block_pairs(fp, tk):
        # torch nn.LayerNorm([planes, 1, 1]) stores (C,1,1) weights; the flax
        # LN over the channel axis stores (C,) — flatten on conversion
        flat = lambda w: np.reshape(np.asarray(w), -1)
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.conv_mask")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.channel_mul_conv.0")
            + [((*fp, "LayerNorm_0", "scale"), f"{tk}.channel_mul_conv.1.weight", flat),
               ((*fp, "LayerNorm_0", "bias"), f"{tk}.channel_mul_conv.1.bias", flat)]
            + conv_pairs((*fp, "Conv_2"), f"{tk}.channel_mul_conv.3")
        )

    def glsa_pairs(fp, tk):
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.local_11conv")
            + conv_branch_pairs((*fp, "ConvBranch_0"), f"{tk}.local")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.global_11conv")
            + context_block_pairs((*fp, "ContextBlock_0"), f"{tk}.GlobelBlock")
            + basic_conv2d_pairs((*fp, "BasicConv2d_0"), f"{tk}.conv1_1")
        )

    for i, tk in enumerate(("GLSA_c4", "GLSA_c3", "GLSA_c2")):
        p += glsa_pairs((f"GLSA_{i}",), tk)
    p += basic_conv2d_pairs(("BasicConv2d_0",), "fuse2.0")
    p += conv_pairs(("Conv_0",), "fuse2.1", bias=False)
    p += basic_conv2d_pairs(("BasicConv2d_1",), "L_feature")
    p += basic_conv2d_pairs(("BasicConv2d_2",), "fuse")
    sba = ("SBA_0",)
    p += conv_pairs((*sba, "Conv_0"), "SBA.fc1", bias=False)
    p += conv_pairs((*sba, "Conv_1"), "SBA.fc2", bias=False)
    p += basic_conv2d_pairs((*sba, "BasicConv2d_0"), "SBA.d_in1")
    p += basic_conv2d_pairs((*sba, "BasicConv2d_1"), "SBA.d_in2")
    p += basic_conv2d_pairs((*sba, "BasicConv2d_2"), "SBA.conv.0")
    p += conv_pairs((*sba, "Conv_2"), "SBA.conv.1", bias=False)
    return p


def dkdualnet_pairs(depths=(2, 2, 2, 2), dims=(48, 96, 192, 384)):
    """Map `mm_unet_tpu.models.dkdualnet.dkDualNet` <- reference
    `src/devDualNet/devDualNet.py:307-362`: DLK-block encoder, three v2
    bi-Mamba AttentionBlocks, Convblock fuse heads, transpose-conv outputs.

    The reference DLKBlock reuses ONE LayerNorm and ONE layer_scale for both
    its attention and MLP branches (`devDualNet.py:97-117`); the rebuild keeps
    separate flax params, so both map from the same torch tensor."""

    def dlk_block_pairs(fp, tk):
        same = lambda fname: [((*fp, fname, "scale"), f"{tk}.norm_layer.weight", "raw"),
                              ((*fp, fname, "bias"), f"{tk}.norm_layer.bias", "raw")]
        sg = f"{tk}.attn.spatial_gating_unit"
        return (
            same("LayerNorm_0") + same("LayerNorm_1")
            + [((*fp, "layer_scale"), f"{tk}.layer_scale", "raw"),
               ((*fp, "layer_scale2"), f"{tk}.layer_scale", "raw")]
            + conv_pairs((*fp, "Conv_0"), f"{tk}.attn.proj_1")
            + conv_pairs((*fp, "DLK_0", "Conv_0"), f"{sg}.att_conv1")
            + conv_pairs((*fp, "DLK_0", "Conv_1"), f"{sg}.att_conv2")
            + conv_pairs((*fp, "DLK_0", "Conv_2"), f"{sg}.spatial_se.0")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.attn.proj_2")
            + conv_pairs((*fp, "Mlp_0", "Conv_0"), f"{tk}.mlp.fc1")
            + conv_pairs((*fp, "Mlp_0", "Conv_1"), f"{tk}.mlp.dwconv")
            + conv_pairs((*fp, "Mlp_0", "Conv_2"), f"{tk}.mlp.fc2")
        )

    def conv_block_pairs(fp, tk):
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.conv1.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv1.1")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.conv2.0")
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.conv2.1")
        )

    def attention_pairs(fp, tk, d_model):
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.att_conv")
            + norm_pairs((*fp, "LayerNorm_0"), f"{tk}.norm")
            + mamba_pairs((*fp, "mamba"), f"{tk}.mamba", d_model, dirs=("", "_b"))
            + conv_pairs((*fp, "Conv_1"), f"{tk}.spatial_se.0")
            + conv_pairs((*fp, "Conv_2"), f"{tk}.conv")
        )

    def attention_block_pairs(fp, tk, in_dim):
        return (
            attention_pairs((*fp, "MambaAttention_0"), f"{tk}.gobel_attention", in_dim // 2)
            + attention_pairs((*fp, "MambaAttention_1"), f"{tk}.local_attention", in_dim // 2)
            + conv_block_pairs((*fp, "ConvBlock_0"), f"{tk}.downsample")
        )

    p = []
    bi = 0
    for i in range(4):
        p += conv_pairs((f"Conv_{i}",), f"dnet_down.downsample_layers.{i}")
        p += norm_pairs((f"LayerNorm_{i}",), f"dnet_down.norm_layers.{i}")
        for j in range(depths[i]):
            p += dlk_block_pairs((f"DLKBlock_{bi}",), f"dnet_down.stages.{i}.{j}")
            bi += 1
    # call order: block4, block3, block2 (`devDualNet.py:343-346`)
    for fi, (tk, d) in enumerate((("block4", dims[3]), ("block3", dims[2]),
                                  ("block2", dims[1]))):
        p += attention_block_pairs((f"AttentionBlock_{fi}",), tk, d)
    p += conv_block_pairs(("ConvBlock_0",), "fuse2.0")
    p += conv_pairs(("Conv_4",), "fuse2.1", bias=False)
    p += conv_block_pairs(("ConvBlock_1",), "L_feature")
    p += conv_block_pairs(("ConvBlock_2",), "fuse")
    p += [(("ConvTranspose_0", "kernel"), "o1_u.weight", "convT"),
          (("ConvTranspose_0", "bias"), "o1_u.bias", "raw"),
          (("ConvTranspose_1", "kernel"), "o2_u.weight", "convT"),
          (("ConvTranspose_1", "bias"), "o2_u.bias", "raw")]
    p += conv_pairs(("Conv_5",), "head", bias=False)
    return p


def cvc_unetr_pairs(depths=(3, 4, 6, 3), out_dim=32):
    """Map `mm_unet_tpu.models.cvc_unetr.CVC_Unetr` <- reference
    `src/CVCUNETR/NewCVC.py:583-635`: its own pvt_v2_b2, three rep-style
    AttentionBlocks (GobleAttention + LocalAttention), fuse heads, and the
    GlobalSparseTransformer + LocalReverseDiffusion output branch."""
    p = pvtv2_pairs(
        ("PVTv2_0",),
        pe_key=lambda i: f"backbone.patch_embed{i + 1}",
        blk_key=lambda i, j: f"backbone.block{i + 1}.{j}",
        norm_key=lambda i: f"backbone.norm{i + 1}",
        depths=depths,
    )

    def goble_pairs(fp, tk):
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.conv")
            + norm_pairs((*fp, "GroupNorm_0"), f"{tk}.norm")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.base_conv", bias=False)
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.base_norm")
            + conv_pairs((*fp, "Conv_2"), f"{tk}.add_conv", bias=False)
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.add_norm")
            + conv_pairs((*fp, "Conv_3"), f"{tk}.mlp.line_conv_0", bias=False)
            + conv_pairs((*fp, "Conv_4"), f"{tk}.mlp.line_conv_1", bias=False)
        )

    def local_pairs(fp, tk):
        return (
            bn_pairs((*fp, "BatchNorm_0"), f"{tk}.bn1")
            + conv_pairs((*fp, "Conv_0"), f"{tk}.pointwise_conv_0", bias=False)
            + conv_pairs((*fp, "Conv_1"), f"{tk}.depthwise_conv", bias=False)
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.bn2")
            + conv_pairs((*fp, "Conv_2"), f"{tk}.pointwise_conv_1", bias=False)
        )

    def basic_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.conv", bias=False)
                + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.bn"))

    def attention_block_pairs(fp, tk):
        return (
            goble_pairs((*fp, "GobleAttention_0"), f"{tk}.gobel_attention")
            + local_pairs((*fp, "LocalAttention_0"), f"{tk}.local_attention")
            + basic_pairs((*fp, "BasicConv2d_0"), f"{tk}.downsample")
        )

    for fi, tk in enumerate(("block4", "block3", "block2")):
        p += attention_block_pairs((f"AttentionBlock_{fi}",), tk)
    p += basic_pairs(("BasicConv2d_0",), "fuse2.0")
    p += conv_pairs(("Conv_0",), "fuse2.1", bias=False)
    p += basic_pairs(("BasicConv2d_1",), "L_feature")
    p += basic_pairs(("BasicConv2d_2",), "fuse")
    p += conv_pairs(("GlobalSparseTransformer_0", "Conv_0"), "g.qkv", bias=False)
    # depthwise ConvTranspose2d (C,1,r,r) -> painted-block kernel (r*r, C)
    dw_t = lambda w: np.transpose(np.reshape(np.asarray(w), (w.shape[0], -1)))
    lrd = ("LocalReverseDiffusion_0",)
    p += [((*lrd, "kernel"), "l.conv_trans.weight", dw_t),
          ((*lrd, "bias"), "l.conv_trans.bias", "raw")]
    p += norm_pairs((*lrd, "GroupNorm_0"), "l.norm")
    p += conv_pairs((*lrd, "Conv_0"), "l.pointwise_conv", bias=False)
    return p


def bmanet_pairs(depths=(3, 4, 6, 3)):
    """Map `mm_unet_tpu.models.bmanet.BMANet` <- reference
    `src/BMANet/BMANet.py:675-767`: its own pvt_v2_b2, RFB-modified blocks,
    dense aggregation, CBR boundary chain, BAM edge fusion, three cascaded
    BMA refinement heads, sigmoid-before-upsample output."""
    p = pvtv2_pairs(
        ("PVTv2_0",),
        pe_key=lambda i: f"backbone.patch_embed{i + 1}",
        blk_key=lambda i, j: f"backbone.block{i + 1}.{j}",
        norm_key=lambda i: f"backbone.norm{i + 1}",
        depths=depths,
    )

    def basic_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.conv", bias=False)
                + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.bn"))

    def rfb_pairs(fp, tk):
        q = basic_pairs((*fp, "BasicConv2d_0"), f"{tk}.branch0.0")
        bi = 1
        for br in (1, 2, 3):
            for j in range(4):
                q += basic_pairs((*fp, f"BasicConv2d_{bi}"), f"{tk}.branch{br}.{j}")
                bi += 1
        q += basic_pairs((*fp, "BasicConv2d_13"), f"{tk}.conv_cat")
        q += basic_pairs((*fp, "BasicConv2d_14"), f"{tk}.conv_res")
        return q

    for i in range(4):
        p += rfb_pairs((f"RFB_{i}",), f"rfb{i + 1}_1")
    agg = ("Aggregation_0",)
    for fi, tk in enumerate(("conv_upsample1", "conv_upsample2", "conv_upsample3",
                             "conv_upsample4", "conv_concat2", "conv_upsample5",
                             "conv_concat3", "conv4")):
        p += basic_pairs((*agg, f"BasicConv2d_{fi}"), f"agg.{tk}")
    p += conv_pairs((*agg, "Conv_0"), "agg.conv6")
    p += conv_pairs((*agg, "Conv_1"), "agg.conv5")
    # CBR chain, call order CBR4 -> CBR3 -> CBR2 -> CBR1 (`BMANet.py:745-753`)
    for fi, n in enumerate((4, 3, 2, 1)):
        p += conv_pairs((f"Conv_{fi}",), f"CBR{n}.cbr.0")
        p += bn_pairs((f"BatchNorm_{fi}",), f"CBR{n}.cbr.1")
    fc = ("FusionConv_0",)
    p += conv_pairs((*fc, "Conv_0"), "BAM.fusion_conv.down")
    p += conv_pairs((*fc, "Conv_1"), "BAM.fusion_conv.channel_attention.fc.0", bias=False)
    p += conv_pairs((*fc, "Conv_2"), "BAM.fusion_conv.channel_attention.fc.2", bias=False)
    p += conv_pairs((*fc, "Conv_3"), "BAM.fusion_conv.conv_3x3")
    p += conv_pairs((*fc, "Conv_4"), "BAM.fusion_conv.conv_5x5")
    p += conv_pairs((*fc, "Conv_5"), "BAM.fusion_conv.conv_7x7")
    p += conv_pairs((*fc, "Conv_6"), "BAM.fusion_conv.spatial_attention.conv1", bias=False)
    p += conv_pairs((*fc, "Conv_7"), "BAM.fusion_conv.up")

    def bma_pairs(fp, tk):
        cb = (*fp, "CBAMBlock_0")
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.conv_pred")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.fusion_conv.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.fusion_conv.1")
            + conv_pairs((*fp, "Conv_2"), f"{tk}.attention.0")
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.attention.1")
            + dense_pairs((*cb, "Dense_0"), f"{tk}.cbam.ChannelGate.mlp.1")
            + dense_pairs((*cb, "Dense_1"), f"{tk}.cbam.ChannelGate.mlp.3")
            + conv_pairs((*cb, "Conv_0"), f"{tk}.cbam.SpatialGate.spatial")
            + conv_pairs((*fp, "Conv_3"), f"{tk}.pred")
        )

    for fi, n in enumerate((4, 3, 2)):
        p += bma_pairs((f"BMA_{fi}",), f"BMA{n}")
    p += basic_pairs(("BasicConv2d_0",), "fuse")
    return p


def res2net50_pairs(fpath=("Res2Net50Encoder_0",), tprefix="resnet.",
                    blocks=(3, 4, 6, 3)):
    """Pair list for `mm_unet_tpu.models.resnet.Res2Net50Encoder` <- the
    reference deep-stem Res2Net-50 v1b (`src/CFANet/CFANet.py:13-147`)."""
    t = lambda k: f"{tprefix}{k}"
    p = []
    for fi, tk in ((0, "conv1.0"), (1, "conv1.3"), (2, "conv1.6")):
        p += conv_pairs((*fpath, f"Conv_{fi}"), t(tk), bias=False)
    for fi, tk in ((0, "conv1.1"), (1, "conv1.4"), (2, "bn1")):
        p += bn_pairs((*fpath, f"BatchNorm_{fi}"), t(tk))
    k = 0
    for i, n in enumerate(blocks):
        for j in range(n):
            fb = (*fpath, f"Bottle2neck_{k}")
            tb = t(f"layer{i + 1}.{j}")
            k += 1
            p += conv_pairs((*fb, "Conv_0"), f"{tb}.conv1", bias=False)
            p += bn_pairs((*fb, "BatchNorm_0"), f"{tb}.bn1")
            for s in range(3):  # scale-1 hierarchical 3x3s
                p += conv_pairs((*fb, f"Conv_{1 + s}"), f"{tb}.convs.{s}", bias=False)
                p += bn_pairs((*fb, f"BatchNorm_{1 + s}"), f"{tb}.bns.{s}")
            p += conv_pairs((*fb, "Conv_4"), f"{tb}.conv3", bias=False)
            p += bn_pairs((*fb, "BatchNorm_4"), f"{tb}.bn3")
            if j == 0:  # every stage-first block has the v1b shortcut
                p += conv_pairs((*fb, "Conv_5"), f"{tb}.downsample.1", bias=False)
                p += bn_pairs((*fb, "BatchNorm_5"), f"{tb}.downsample.2")
    return p


def cfanet_pairs(channel=64):
    """Map `mm_unet_tpu.models.cfanet.CFANet` <- reference
    `src/CFANet/CFANet.py:414-553`: deep-stem Res2Net-50 encoder, GateFusion,
    CFF high fusions, edge decoder, dual BAM saliency cascades."""
    p = res2net50_pairs()

    def cbr_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.0")
                + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.1"))

    def basic_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.conv", bias=False)
                + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.bn"))

    def ca_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.fc1", bias=False)
                + conv_pairs((*fp, "Conv_1"), f"{tk}.fc2", bias=False))

    def bam_pairs(fp, tk):
        gm = (*fp, "GlobalModule_0")
        return (
            basic_pairs((*fp, "BasicConv2d_0"), f"{tk}.conv_layer")
            + conv_pairs((*gm, "Conv_0"), f"{tk}.global_att.global_att.1")
            + bn_pairs((*gm, "BatchNorm_0"), f"{tk}.global_att.global_att.2")
            + conv_pairs((*gm, "Conv_1"), f"{tk}.global_att.global_att.4")
            + bn_pairs((*gm, "BatchNorm_1"), f"{tk}.global_att.global_att.5")
        )

    def cff_pairs(fp, tk):
        return (
            basic_pairs((*fp, "BasicConv2d_0"), f"{tk}.layer0")
            + basic_pairs((*fp, "BasicConv2d_1"), f"{tk}.layer1")
            + cbr_pairs((*fp, "ConvBNReLU_0"), f"{tk}.layer3_1")
            + cbr_pairs((*fp, "ConvBNReLU_1"), f"{tk}.layer5_1")
            + cbr_pairs((*fp, "ConvBNReLU_2"), f"{tk}.layer3_2")
            + cbr_pairs((*fp, "ConvBNReLU_3"), f"{tk}.layer5_2")
            + cbr_pairs((*fp, "ConvBNReLU_4"), f"{tk}.layer_out")
        )

    p += cbr_pairs(("ConvBNReLU_0",), "layer0")
    p += cbr_pairs(("ConvBNReLU_1",), "layer1")
    p += conv_pairs(("GateFusion_0", "Conv_0"), "low_fusion.gate_1")
    p += conv_pairs(("GateFusion_0", "Conv_1"), "low_fusion.gate_2")
    for fi, tk in enumerate(("layer_edge0", "layer_edge1", "layer_edge2")):
        p += cbr_pairs((f"ConvBNReLU_{fi + 2}",), tk)
    p += conv_pairs(("Conv_0",), "layer_edge3.0")
    for fi, tk in enumerate(("atten_edge_ori", "atten_edge_0", "atten_edge_1",
                             "atten_edge_2")):
        p += ca_pairs((f"ChannelAttention_{fi}",), tk)
    p += cff_pairs(("CFF_0",), "high_fusion1")
    p += cff_pairs(("CFF_1",), "high_fusion2")
    # cascades: (cat_01, hig01, cat_11, hig11, cat_21, hig21, cat_31) then
    # the same with suffix 2 (`CFANet.py:525-546`)
    for suf, conv_i in (("1", "Conv_1"), ("2", "Conv_2")):
        chain = (f"cat_0{suf}", f"layer_hig0{suf}", f"cat_1{suf}",
                 f"layer_hig1{suf}", f"cat_2{suf}", f"layer_hig2{suf}",
                 f"cat_3{suf}")
        for step, tk in enumerate(chain):
            if tk.startswith("cat"):
                p += bam_pairs((f"BAM_{(0 if suf == '1' else 4) + step // 2}",), tk)
            else:
                p += cbr_pairs((f"ConvBNReLU_{(5 if suf == '1' else 8) + step // 2}",), tk)
        p += conv_pairs((conv_i,), f"layer_hig3{suf}.0")
    p += conv_pairs(("Conv_3",), "layer_fil.0")
    return p


def pvt_cascade_pairs(depths=(3, 4, 6, 3)):
    """Map `mm_unet_tpu.models.pvt_cascade.PVT_CASCADE` <- reference
    `src/PVT_CA/PVT_CA.py:569-628`: PVTv2-b2 encoder + CASCADE decoder
    (attention-gated skips, per-level channel attention, ONE shared spatial
    attention), four prediction heads."""
    p = pvtv2_pairs(
        ("PVTv2_0",),
        pe_key=lambda i: f"backbone.patch_embed{i + 1}",
        blk_key=lambda i, j: f"backbone.block{i + 1}.{j}",
        norm_key=lambda i: f"backbone.norm{i + 1}",
        depths=depths,
    )

    def conv_block_pairs(fp, tk):
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.conv.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.conv.1")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.conv.3")
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.conv.4")
        )

    def up_conv_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.up.1")
                + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.up.2"))

    def ag_pairs(fp, tk):
        return (
            conv_pairs((*fp, "Conv_0"), f"{tk}.W_g.0")
            + bn_pairs((*fp, "BatchNorm_0"), f"{tk}.W_g.1")
            + conv_pairs((*fp, "Conv_1"), f"{tk}.W_x.0")
            + bn_pairs((*fp, "BatchNorm_1"), f"{tk}.W_x.1")
            + conv_pairs((*fp, "Conv_2"), f"{tk}.psi.0")
            + bn_pairs((*fp, "BatchNorm_2"), f"{tk}.psi.1")
        )

    def ca_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.fc1", bias=False)
                + conv_pairs((*fp, "Conv_1"), f"{tk}.fc2", bias=False))

    p += conv_pairs(("Conv_0",), "decoder.SA.conv1", bias=False)  # shared SA
    p += conv_pairs(("Conv_1",), "decoder.Conv_1x1")
    p += ca_pairs(("ChannelAttention_0",), "decoder.CA4")
    p += conv_block_pairs(("ConvBlock_0",), "decoder.ConvBlock4")
    for fi, n in enumerate((3, 2, 1)):
        p += up_conv_pairs((f"UpConv_{fi}",), f"decoder.Up{n}")
        p += ag_pairs((f"AttentionGate_{fi}",), f"decoder.AG{n}")
        p += ca_pairs((f"ChannelAttention_{fi + 1}",), f"decoder.CA{n}")
        p += conv_block_pairs((f"ConvBlock_{fi + 1}",), f"decoder.ConvBlock{n}")
    for fi, n in enumerate((1, 2, 3, 4)):
        p += conv_pairs((f"Conv_{fi + 2}",), f"out_head{n}")
    return p


def hwaunetr_pairs(dims=(48, 96, 192, 384), depths=(1, 1, 1, 1)):
    """Map `mm_unet_tpu.models.hwaunetr.HWAUNETR` <- reference
    `src/model/HWAUNETR.py:405-441`: downsample/GMP/MFA encoder (v3 Mamba
    whose directional outputs drive an LxL attention), InstanceNorm+MLP trunk,
    transposed-conv decoder. InstanceNorms are non-affine (no params)."""
    p = []
    mfa = 0
    for i in range(4):
        tds = f"Encoder.downsample_layers.{i}.{0 if i == 0 else 1}"
        p += conv_pairs((f"Conv_{i}",), tds)
        g = (f"GMPBlock_{i}",)
        tg = f"Encoder.gscs.{i}"
        for fj, tk in enumerate(("proj", "proj2", "proj3", "proj4")):
            p += conv_pairs((*g, f"Conv_{fj}"), f"{tg}.{tk}")
        for j in range(depths[i]):
            fp = (f"MFABlock_{mfa}",)
            tb = f"Encoder.stages.{i}.{j}"
            mfa += 1
            p += norm_pairs((*fp, "LayerNorm_0"), f"{tb}.norm")
            p += mamba_pairs((*fp, "mamba"), f"{tb}.mamba", dims[i])
            p += conv_pairs((*fp, "Conv_0"), f"{tb}.fussion1")
            p += conv_pairs((*fp, "Conv_1"), f"{tb}.fussion2")
        m = (f"MlpChannel_{i}",)
        p += conv_pairs((*m, "Conv_0"), f"Encoder.mlps.{i}.fc1")
        p += conv_pairs((*m, "Conv_1"), f"Encoder.mlps.{i}.fc2")
    p += conv_pairs(("Conv_4",), "hidden_downsample")
    for fi in range(4):
        tk = f"TSconv{fi + 1}"
        p += [((f"ConvTranspose_{2 * fi}", "kernel"), f"{tk}.transposed1.weight", "convT"),
              ((f"ConvTranspose_{2 * fi}", "bias"), f"{tk}.transposed1.bias", "raw"),
              ((f"ConvTranspose_{2 * fi + 1}", "kernel"), f"{tk}.transposed2.weight", "convT"),
              ((f"ConvTranspose_{2 * fi + 1}", "bias"), f"{tk}.transposed2.bias", "raw")]
        p += norm_pairs((f"GroupNorm_{fi}",), f"{tk}.norm")
    p += [(("ConvTranspose_8", "kernel"), "SegHead.weight", "convT"),
          (("ConvTranspose_8", "bias"), "SegHead.bias", "raw")]
    return p


def vanet_pairs(depths=(1, 2, 10)):
    """Map `mm_unet_tpu.models.vanet.VANet` <- reference `src/VANet/VANet.py`
    + `models/cls_cvt.py` (CvT-13 yaml spec): conv patch embeds, CvT blocks
    with dw-conv+BN projections and mask-guided attention, PatchExpand
    decoder, four mask heads. `alpha` is mapped only on blocks that receive
    the mask prior `r` (the rebuild creates it lazily)."""

    def cvt_block_pairs(fp, tk, qkv_bias=True, alpha=False):
        at = (*fp, "CvTAttention_0")
        p = (
            norm_pairs((*fp, "LayerNorm_0"), f"{tk}.norm1")
            + norm_pairs((*fp, "LayerNorm_1"), f"{tk}.norm2")
            + dense_pairs((*fp, "Dense_0"), f"{tk}.mlp.fc1")
            + dense_pairs((*fp, "Dense_1"), f"{tk}.mlp.fc2")
        )
        for fi, name in enumerate(("q", "k", "v")):
            cp = (*at, f"ConvProj_{fi}")
            p += conv_pairs((*cp, "Conv_0"), f"{tk}.attn.conv_proj_{name}.conv",
                            bias=False)
            p += bn_pairs((*cp, "BatchNorm_0"), f"{tk}.attn.conv_proj_{name}.bn")
            p += dense_pairs((*at, f"Dense_{fi}"), f"{tk}.attn.proj_{name}",
                             bias=qkv_bias)
        p += dense_pairs((*at, "Dense_3"), f"{tk}.attn.proj")
        if alpha:
            p += [((*at, "alpha"), f"{tk}.attn.alpha", "raw")]
        return p

    def patch_pairs(fp, tk):
        return (conv_pairs((*fp, "Conv_0"), f"{tk}.proj")
                + norm_pairs((*fp, "LayerNorm_0"), f"{tk}.norm"))

    p = patch_pairs(("PatchMerge_0",), "encoder_stage0.patch_embed")
    blk = 0
    for j in range(depths[0]):
        p += cvt_block_pairs((f"CvTBlock_{blk}",), f"encoder_stage0.blocks.{j}")
        blk += 1
    p += patch_pairs(("PatchMerge_1",), "encoder_stage1.patch_embed")
    for j in range(depths[1]):
        p += cvt_block_pairs((f"CvTBlock_{blk}",), f"encoder_stage1.blocks.{j}")
        blk += 1
    p += patch_pairs(("PatchMerge_2",), "encoder_stage2_merge")
    for j in range(depths[2] // 2):
        p += cvt_block_pairs((f"CvTBlock_{blk}",), f"encoder_stage2_blk.{j}")
        blk += 1
    p += conv_pairs(("Conv_0",), "mask_head0")
    for j in range(depths[2] - depths[2] // 2):
        p += cvt_block_pairs((f"CvTBlock_{blk}",), f"decoder_stage0_blk.{j}",
                             alpha=True)
        blk += 1
    p += conv_pairs(("Conv_1",), "mask_head1")
    p += patch_pairs(("PatchExpand_0",), "decoder_stage1_expand")
    for j in range(depths[1]):
        p += cvt_block_pairs((f"CvTBlock_{blk}",), f"decoder_stage1_blk.{j}",
                             qkv_bias=False, alpha=True)
        blk += 1
    p += conv_pairs(("Conv_2",), "mask_head2")
    p += patch_pairs(("PatchExpand_1",), "decoder_stage2_expand")
    for j in range(depths[0]):
        p += cvt_block_pairs((f"CvTBlock_{blk}",), f"decoder_stage2_blk.{j}",
                             qkv_bias=False, alpha=True)
        blk += 1
    p += conv_pairs(("Conv_3",), "mask_head3")
    return p


def _find_subtree(tree, prefix: str, path=()):
    """DFS for the first dict key starting with `prefix`; returns its path."""
    if not isinstance(tree, dict) and not hasattr(tree, "items"):
        return None
    for k, sub in tree.items():
        if str(k).startswith(prefix):
            return path + (k,)
        found = _find_subtree(sub, prefix, path + (k,))
        if found is not None:
            return found
    return None


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def warm_start_variables(variables, config):
    """Load a torch backbone checkpoint into freshly-initialised variables.

    Mirrors the reference models' in-__init__ `.pth` loads (e.g.
    `/root/reference/src/DuAT/DuAT.py:332-337`,
    `src/FCBFormer/models.py:111`): if the selected model's config block
    declares a `model_dir` that exists on disk, the torch state_dict is
    converted and grafted onto the PVTv2 / Res2Net backbone subtree. No-op
    (returns `variables` unchanged) when no checkpoint is configured/present.
    """
    import os

    try:
        from mm_unet_tpu.models.registry import _model_kwargs

        name = config.finetune.model_choose
        path = _model_kwargs(config, name).get("model_dir", "")
    except Exception:
        return variables
    if not path or not os.path.exists(path):
        return variables

    sd = load_torch_state_dict(path)

    def to_mutable(t):
        return (
            {k: to_mutable(s) for k, s in t.items()} if hasattr(t, "items") else t
        )

    v = to_mutable(variables)
    pvt_path = _find_subtree(v.get("params", {}), "PVTv2")
    if pvt_path is not None:
        depths = (3, 4, 18, 3) if any("block3.7." in k for k in sd) else (3, 4, 6, 3)
        loaded = load_pvtv2_params(_get(v["params"], pvt_path), sd, depths)
        _set(v["params"], pvt_path, loaded)
        return v
    r2n_path = _find_subtree(v.get("params", {}), "Res2Net50Encoder")
    if r2n_path is not None:
        sub = {"params": _get(v["params"], r2n_path)}
        if "batch_stats" in v:
            sub["batch_stats"] = _get(v["batch_stats"], r2n_path)
        loaded = load_res2net_params(sub, sd)
        _set(v["params"], r2n_path, loaded["params"])
        if "batch_stats" in loaded and "batch_stats" in v:
            _set(v["batch_stats"], r2n_path, loaded["batch_stats"])
        return v
    return variables


# ---------------------------------------------------------------------------
# UNETR / SwinUNETR (2-D) <- the torch MONAI-restatement harness
# (tests/test_monai_restatement_parity.py). The torch-side key names are the
# restatement's own; MONAI's real checkpoints are not loadable in this
# environment (MONAI absent), so these pairs close the cross-framework
# evidence gap rather than a .pth round trip.
# ---------------------------------------------------------------------------

def instnorm_pairs(fpath, tkey):
    """InstanceNorm (affine): params only, no running stats."""
    return [((*fpath, "scale"), f"{tkey}.weight", "raw"),
            ((*fpath, "bias"), f"{tkey}.bias", "raw")]


def resblock_pairs(fpath, tkey, has_proj):
    """MONAI UnetResBlock restatement: conv-IN-lrelu-conv-IN (+1x1-IN res)."""
    p = conv_pairs((*fpath, "Conv_0"), f"{tkey}.conv1", bias=False)
    p += instnorm_pairs((*fpath, "InstanceNorm_0"), f"{tkey}.norm1")
    p += conv_pairs((*fpath, "Conv_1"), f"{tkey}.conv2", bias=False)
    p += instnorm_pairs((*fpath, "InstanceNorm_1"), f"{tkey}.norm2")
    if has_proj:
        p += conv_pairs((*fpath, "Conv_2"), f"{tkey}.conv3", bias=False)
        p += instnorm_pairs((*fpath, "InstanceNorm_2"), f"{tkey}.norm3")
    return p


def deconv_pairs(fpath, tkey):
    return [((*fpath, "kernel"), f"{tkey}.weight", "convT"),
            ((*fpath, "bias"), f"{tkey}.bias", "raw")]


def mhdpa_pairs(fpath, tkey, embed: int, heads: int):
    """flax nn.MultiHeadDotProductAttention <- fused torch qkv Linear +
    out Linear. qkv.weight is (3*embed, embed) ordered [q; k; v]."""
    hd = embed // heads

    def _qkv_w(i):
        def f(w):
            w = np.asarray(w)[i * embed:(i + 1) * embed]  # (embed_out, embed_in)
            return np.ascontiguousarray(w.T.reshape(embed, heads, hd))
        return f

    def _qkv_b(i):
        def f(b):
            return np.asarray(b)[i * embed:(i + 1) * embed].reshape(heads, hd)
        return f

    def _out_w(w):
        return np.ascontiguousarray(np.asarray(w).T.reshape(heads, hd, embed))

    p = []
    for i, name in enumerate(("query", "key", "value")):
        p.append(((*fpath, name, "kernel"), f"{tkey}.qkv.weight", _qkv_w(i)))
        p.append(((*fpath, name, "bias"), f"{tkey}.qkv.bias", _qkv_b(i)))
    p.append(((*fpath, "out", "kernel"), f"{tkey}.out.weight", _out_w))
    p.append(((*fpath, "out", "bias"), f"{tkey}.out.bias", "raw"))
    return p


def unetr_pairs(embed: int = 768, heads: int = 12, num_layers: int = 12):
    """mm_unet_tpu.models.unetr.UNETR <- tests TorchUNETR2D restatement."""
    p = conv_pairs(("Conv_0",), "patch_embed")
    p += [(("pos_embedding",), "pos_embed", "raw")]
    for i in range(num_layers):
        b, t = (f"TransformerBlock_{i}",), f"blocks.{i}"
        p += norm_pairs((*b, "LayerNorm_0"), f"{t}.norm1")
        p += mhdpa_pairs((*b, "MultiHeadDotProductAttention_0"), f"{t}", embed, heads)
        p += norm_pairs((*b, "LayerNorm_1"), f"{t}.norm2")
        p += dense_pairs((*b, "Dense_0"), f"{t}.fc1")
        p += dense_pairs((*b, "Dense_1"), f"{t}.fc2")
    p += norm_pairs(("LayerNorm_0",), "norm")
    p += resblock_pairs(("ConvBlock_0",), "enc1", has_proj=True)
    # PrUpBlocks: first deconv, then num_layer x (deconv + res block)
    for pi, num_layer in enumerate((2, 1, 0)):
        fp, t = (f"PrUpBlock_{pi}",), f"enc{pi + 2}"
        p += deconv_pairs((*fp, "Deconv_0", "ConvTranspose_0"), f"{t}.up0")
        for j in range(num_layer):
            p += deconv_pairs((*fp, f"Deconv_{j + 1}", "ConvTranspose_0"),
                              f"{t}.ups.{j}.deconv")
            p += resblock_pairs((*fp, f"ConvBlock_{j}"), f"{t}.ups.{j}.block",
                                has_proj=False)
    for di in range(4):
        fp, t = (f"UpBlock_{di}",), f"dec{3 - di}"
        p += deconv_pairs((*fp, "Deconv_0", "ConvTranspose_0"), f"{t}.deconv")
        p += resblock_pairs((*fp, "ConvBlock_0"), f"{t}.block", has_proj=True)
    p += conv_pairs(("Conv_1",), "out")
    return p


def swin_unetr_pairs(feature_size: int = 24, depths=(2, 2, 2, 2),
                     num_heads=(3, 6, 12, 24)):
    """mm_unet_tpu.models.swin_unetr.SwinUNETR <- TorchSwinUNETR2D."""
    p = conv_pairs(("Conv_0",), "patch_embed")
    blk = 0
    dim = feature_size
    for si, (depth, heads) in enumerate(zip(depths, num_heads)):
        for j in range(depth):
            b, t = (f"SwinBlock_{blk}",), f"stages.{si}.blocks.{j}"
            p += norm_pairs((*b, "LayerNorm_0"), f"{t}.norm1")
            w = (*b, "WindowAttention_0")
            p += dense_pairs((*w, "Dense_0"), f"{t}.attn.qkv")
            p += [((*w, "rel_pos_bias"), f"{t}.attn.rel_pos_bias", "raw")]
            p += dense_pairs((*w, "Dense_1"), f"{t}.attn.proj")
            p += norm_pairs((*b, "LayerNorm_1"), f"{t}.norm2")
            p += dense_pairs((*b, "Dense_0"), f"{t}.fc1")
            p += dense_pairs((*b, "Dense_1"), f"{t}.fc2")
            blk += 1
        m, t = (f"PatchMerging_{si}",), f"stages.{si}"
        p += norm_pairs((*m, "LayerNorm_0"), f"{t}.norm")
        p += dense_pairs((*m, "Dense_0"), f"{t}.reduction", bias=False)
        dim *= 2
    # encoders/decoders: ResConvBlock_0..4 = enc0, enc1, enc2, enc3, dec4;
    # ResConvBlock_5 = the hidden[3] skip block (argument of UpBlock_0)
    # only enc0 changes channel count (3 -> fs): it alone has the 1x1 res proj
    names = [("ResConvBlock_0", "enc0", True), ("ResConvBlock_1", "enc1", False),
             ("ResConvBlock_2", "enc2", False), ("ResConvBlock_3", "enc3", False),
             ("ResConvBlock_4", "dec4", False), ("ResConvBlock_5", "skip3", False)]
    for fname, tname, proj in names:
        p += resblock_pairs((fname,), tname, has_proj=proj)
    for di in range(5):
        fp, t = (f"UpBlock_{di}",), f"up{di}"
        p += deconv_pairs((*fp, "ConvTranspose_0"), f"{t}.deconv")
        p += resblock_pairs((*fp, "ResConvBlock_0"), f"{t}.block", has_proj=True)
    p += conv_pairs(("Conv_1",), "out")
    return p
