"""Trainer stack: losses, metrics, optimizer/schedule, sliding-window
inference, checkpointing, and the jitted SPMD train/val loops."""
