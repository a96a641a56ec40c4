"""Test configuration: deterministic CPU backend with 8 virtual devices.

The reference repo has no CPU-runnable test story (its kernel tests require
CUDA); here every test runs on CPU — JAX semantics are backend-identical —
and multi-device sharding tests use a virtual 8-device host platform
(`--xla_force_host_platform_device_count=8`), per SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force CPU
# through the config API so tests are deterministic and tunnel-free.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
