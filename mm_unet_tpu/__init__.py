"""MM-UNet TPU: a TPU-native (JAX/XLA/Pallas/pjit) medical image segmentation
framework with the capabilities of the MM-UNet reference stack.

Layers (mirroring the reference's implicit layering, rebuilt TPU-first):

- ``mm_unet_tpu.ops``      — compute kernels: the selective-scan SSM recurrence
  (Pallas chunked associative scan), causal depthwise conv1d (fused XLA conv),
  bilinear grid sampling, serpentine flatten geometry.
- ``mm_unet_tpu.models``   — model zoo (flagship MM_Net plus baselines) built on
  flax.linen, all returning ``(B, num_classes, H, W)`` logits.
- ``mm_unet_tpu.data``     — host-side dataset pipelines (DRIVE/STARE vessels,
  polyp sets, EDD 5-class) with seeded augmentations.
- ``mm_unet_tpu.train``    — losses (DiceFocal), metrics (Dice/IoU/confusion
  family/HD95), optimizer/schedule, sliding-window inference, checkpointing.
- ``mm_unet_tpu.parallel`` — device mesh / sharding utilities (SPMD data
  parallelism over `jax.sharding.Mesh`, XLA collectives instead of NCCL).
"""

__version__ = "0.1.0"
