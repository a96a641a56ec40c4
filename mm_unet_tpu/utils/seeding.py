"""Deterministic seeding (reference `src/utils.py:94-101` `same_seeds`)."""

from __future__ import annotations

import random

import numpy as np


def same_seeds(seed: int = 50) -> int:
    """Seed Python and NumPy RNGs; JAX keys are derived explicitly from the
    returned seed (JAX has no global RNG — keys flow through the code)."""
    random.seed(seed)
    np.random.seed(seed)
    return seed
