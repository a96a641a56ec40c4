#!/usr/bin/env bash
# Training launcher — reference train.sh parity. Multi-host TPU: run this on
# every host; jax.distributed.initialize() picks up the TPU pod topology
# automatically (no torchrun/NCCL analogue needed — XLA collectives over ICI).
set -e
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp_cache}"
python train.py "$@"
