"""Test configuration: deterministic CPU backend with 8 virtual devices.

The reference repo has no CPU-runnable test story (its kernel tests require
CUDA); here every test runs on CPU — JAX semantics are backend-identical —
and multi-device sharding tests use a virtual 8-device host platform
(`--xla_force_host_platform_device_count=8`), per SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Silence XLA:CPU AOT-cache feature-string mismatch spam (benign: the cache
# records XLA pseudo-features like prefer-no-scatter that never appear in the
# host's cpuinfo; the artifact loads and runs).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force CPU
# through the config API so tests are deterministic and tunnel-free.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA:CPU's DEFAULT conv/dot precision is bf16-class (measured 1.2e-2 abs err
# on a 7x7 stem conv vs float64; torch CPU is 3e-6). Parity tests compare
# against torch, so force true-f32 contractions in tests. Production (TPU)
# never imports this conftest and keeps the fast default.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: repeat CI runs skip recompiles of the big models.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_comp_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full-size model forwards, "
        "mini training loops); the default suite is the fast CI gate",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
