"""Model factory mirroring the reference `give_model`
(`/root/reference/src/models.py:22-100`): keyed on
`config.finetune.model_choose`, picking `branch1` (1-class) vs `branch5`
(5-class) kwargs by `dataset_choose != 'EDD_seg'`."""

from __future__ import annotations

from typing import Callable

MODEL_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def deco(ctor):
        MODEL_REGISTRY[name] = ctor
        return ctor

    return deco


def _model_kwargs(config, name: str) -> dict:
    models_cfg = getattr(config, "models", None) or {}
    entry = models_cfg.get(name, {}) if isinstance(models_cfg, dict) else getattr(models_cfg, name, {})
    branch = "branch5" if getattr(config.trainer, "dataset_choose", "") == "EDD_seg" else "branch1"
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
        "dkdualnet", "convunext",
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
