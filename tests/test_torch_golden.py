"""Stored torch-generated golden fixtures (tests/fixtures/torch_golden.npz)
for grid_sample and causal_conv1d parity — runnable without torch installed
(the live-torch tests in test_geometry.py / test_causal_conv1d.py skip when
torch is absent; these pin the same semantics permanently).

Fixture provenance: generated on 2026-08-16 with torch 2.x CPU via the
script embedded in the repo history (F.grid_sample bilinear/zeros/
align_corners=True; F.conv1d groups=D causal padding + silu) — the exact
reference ops MMConv and Mamba depend on (`/root/reference/MMUNet.py:173`,
`/root/reference/requirements/Mamba/mamba/mamba_ssm/modules/mamba_simple.py:168`).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.ops.causal_conv1d import causal_conv1d
from mm_unet_tpu.ops.grid_sample import grid_sample_bilinear

_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "torch_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(_PATH)


def test_grid_sample_matches_stored_torch(golden):
    got = np.asarray(
        grid_sample_bilinear(jnp.asarray(golden["gs_feat"]), jnp.asarray(golden["gs_grid"]))
    )
    np.testing.assert_allclose(got, golden["gs_want"], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("W", [2, 3, 4])
@pytest.mark.parametrize("L", [8, 100])
def test_causal_conv_matches_stored_torch(golden, W, L):
    k = f"cc_{W}_{L}"
    got = causal_conv1d(
        jnp.asarray(golden[k + "_x"]),
        jnp.asarray(golden[k + "_w"]),
        jnp.asarray(golden[k + "_b"]),
        activation="silu",
    )
    np.testing.assert_allclose(np.asarray(got), golden[k + "_want"], rtol=1e-5, atol=1e-5)
