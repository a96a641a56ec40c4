"""Compute ops: selective scan (SSM recurrence), causal conv1d, geometry."""

from mm_unet_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_ref,
)
from mm_unet_tpu.ops.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_update,
)

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "causal_conv1d",
    "causal_conv1d_update",
]
