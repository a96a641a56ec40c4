#!/usr/bin/env bash
# Evaluation launcher — reference verify.sh parity (4-GPU eval becomes a
# single SPMD program over all local TPU devices).
set -e
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp_cache}"
python verify.py "$@"
