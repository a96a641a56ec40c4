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
