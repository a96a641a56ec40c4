from mm_unet_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from mm_unet_tpu.parallel.tp import shard_params, tp_param_specs, MAMBA_TP_RULES
from mm_unet_tpu.parallel.zero import shard_opt_state, is_flat_adamw_state
from mm_unet_tpu.parallel.sp import selective_scan_sp
from mm_unet_tpu.parallel.pp import (
    mixer_pipeline_forward,
    pipeline_apply,
    stack_layer_params,
    make_stage_fn,
)
from mm_unet_tpu.parallel.ep import SwitchFFN, shard_moe_params, ep_param_specs

__all__ = [
    "make_mesh", "shard_batch", "replicate",
    "shard_params", "tp_param_specs", "MAMBA_TP_RULES",
    "shard_opt_state", "is_flat_adamw_state",
    "selective_scan_sp",
    "pipeline_apply", "stack_layer_params", "make_stage_fn",
    "mixer_pipeline_forward",
    "SwitchFFN", "shard_moe_params", "ep_param_specs",
]
