"""Params / FLOPs / throughput harness for the model zoo — parity with the
reference `weight_test.py` (`/root/reference/weight_test.py:23-78`: thop
FLOPs + crude FPS at batch 2, 3x352^2). FLOPs via `jax.jit(...).lower()`
cost analysis; throughput measured on the default backend."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from mm_unet_tpu.models import MODEL_REGISTRY, give_model  # noqa: F401 (registers)
from mm_unet_tpu.utils.config import ConfigDict

SIZE = 352
BATCH = 2

ZOO = {
    "UNet": dict(num_classes=1),
    # MM_Net's v3 slice scan needs (S/32)^2 % 8 == 0 etc.; 352 violates it
    # (as it would in the reference), so it profiles at 384.
    "MM_Net": dict(num_classes=1, remat=False, _size=384),
    "UM_Net": dict(num_classes=1),
    "TransUNet": dict(img_dim=SIZE, class_num=1),
    "CFPNet": dict(classes=1),
    "ConvUNeXt": dict(num_classes=1),
    "UNETR": dict(out_channels=1, img_size=SIZE),
    "SWINUNETR": dict(out_channels=1, use_checkpoint=False),
    "FCBFormer": dict(size=SIZE, num_class=1),
    "DuAT": dict(out_channels=1),
    "CFANet": dict(out_class=1),
    "PVT_CASCADE": dict(o_class=1),
    "CVC_UNETR": dict(out_channels=1),
    "BMANet": dict(out_channel=1),
}


def profile(name: str, kwargs: dict):
    import mm_unet_tpu.models.registry as reg

    kwargs = dict(kwargs)
    size = kwargs.pop("_size", SIZE)
    ctor = reg.MODEL_REGISTRY[name]
    model = ctor(**kwargs)
    x = jnp.zeros((BATCH, 3, size, size), jnp.float32)
    init_fn = jax.jit(model.init) if jax.default_backend() == "tpu" else model.init
    variables = init_fn({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))

    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x) ** 2))
    lowered = fwd.lower(variables, x)
    try:
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", float("nan")) if cost else float("nan")
    except Exception:
        flops = float("nan")

    n = 6

    @jax.jit
    def chain(v, x):
        s = 0.0
        for _ in range(n):
            s = s + jnp.sum(model.apply(v, x + s * 0e-9) ** 2)
        return s

    _ = float(chain(variables, x))  # compile + full sync
    t0 = time.perf_counter()
    _ = float(chain(variables, x))  # n chained forwards, one host round-trip
    fps = BATCH * n / (time.perf_counter() - t0)
    print(
        f"{name:14s} params {n_params / 1e6:8.2f}M  flops {flops / 1e9:10.2f}G  "
        f"throughput {fps:8.2f} img/s"
    )


if __name__ == "__main__":
    import mm_unet_tpu.models.registry as reg

    # trigger registration of every model module
    ConfigDict()  # noqa
    from mm_unet_tpu.models.registry import give_model as _gm  # noqa

    for mod in ("mm_unet", "unet", "um_net", "transunet", "cfpnet", "convunext",
                "unetr", "swin_unetr", "fcbformer", "duat", "cfanet",
                "pvt_cascade", "cvc_unetr", "bmanet", "vanet", "dkdualnet"):
        __import__(f"mm_unet_tpu.models.{mod}")
    for name, kwargs in ZOO.items():
        try:
            profile(name, kwargs)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {e}")
