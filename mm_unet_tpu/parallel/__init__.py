from mm_unet_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from mm_unet_tpu.parallel.tp import shard_params, tp_param_specs, MAMBA_TP_RULES

__all__ = [
    "make_mesh", "shard_batch", "replicate",
    "shard_params", "tp_param_specs", "MAMBA_TP_RULES",
]
