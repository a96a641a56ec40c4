"""Model zoo. `give_model(config)` mirrors the reference factory
(`/root/reference/src/models.py:22-100`): same `model_choose` strings, same
branch1 (1-class) / branch5 (5-class) kwarg selection."""

from mm_unet_tpu.models.registry import give_model, register_model, MODEL_REGISTRY

__all__ = ["give_model", "register_model", "MODEL_REGISTRY"]
