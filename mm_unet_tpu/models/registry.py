"""Model factory mirroring the reference `give_model`
(`/root/reference/src/models.py:22-100`): keyed on
`config.finetune.model_choose`, picking `branch1` (1-class) vs `branch5`
(5-class) kwargs by `dataset_choose != 'EDD_seg'`."""

from __future__ import annotations

from typing import Callable

MODEL_REGISTRY: dict[str, Callable] = {}

# model_choose string -> config.models section key (reference src/models.py:22-100)
_CONFIG_KEYS = {
    "TransUNet": "trans_unet",
    "CFPNet": "cfp_net",
    "UNETR": "u_netr",
    "SWINUNETR": "swin_unetr",
    "DuAT": "duat",
    "UNet": "unet",
    "CFANet": "cfa_net",
    "PVT_CASCADE": "pvt_ca",
    "UM_Net": "um_net",
    "CVC_UNETR": "cvc_unetr",
    "BMANet": "bmanet",
    "VANet": "vanet",
}

# models whose factory branch never switches to branch5 (reference parity)
_BRANCH1_ONLY = {"UM_Net", "MM_Net", "dkDualNet", "FRUNet", "ConvUNetXt", "UNet3Plus", "ATTUNet"}


def register_model(name: str):
    def deco(ctor):
        MODEL_REGISTRY[name] = ctor
        return ctor

    return deco


def _model_kwargs(config, name: str) -> dict:
    models_cfg = getattr(config, "models", None) or {}
    key = _CONFIG_KEYS.get(name, name)
    entry = models_cfg.get(key, models_cfg.get(name, {}))
    use5 = (
        getattr(config.trainer, "dataset_choose", "") == "EDD_seg"
        and name not in _BRANCH1_ONLY
    )
    branch = "branch5" if use5 else "branch1"
    kwargs = entry.get(branch, {}) if isinstance(entry, dict) else getattr(entry, branch, {})
    return dict(kwargs)


def give_model(config):
    """Build the flax module selected by config.finetune.model_choose."""
    # Import model modules for registration side effects.
    import mm_unet_tpu.models.mm_unet  # noqa: F401
    import mm_unet_tpu.models.unet  # noqa: F401

    for optional in (
        "um_net", "transunet", "unetr", "swin_unetr", "fcbformer", "duat",
        "cfanet", "cfpnet", "pvt_cascade", "cvc_unetr", "bmanet", "vanet",
        "dkdualnet", "convunext", "hwaunetr",
    ):
        try:
            __import__(f"mm_unet_tpu.models.{optional}")
        except ImportError:
            pass

    name = config.finetune.model_choose
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model_choose: {name!r}; have {sorted(MODEL_REGISTRY)}")
    kwargs = _model_kwargs(config, name)
    return MODEL_REGISTRY[name](**kwargs)
