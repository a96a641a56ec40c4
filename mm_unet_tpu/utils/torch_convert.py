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
    import copy

    p = copy.deepcopy(
        flax_params if isinstance(flax_params, dict) else flax_params.unfreeze()
    )

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
