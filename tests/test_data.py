"""Data pipeline tests: loader shapes, determinism, native/numpy agreement."""

import numpy as np

from mm_unet_tpu.data.loaders import DataLoader, make_synthetic


def _loader(train, **kw):
    ds = make_synthetic(6, 32, seed=0)
    return DataLoader(ds, 2, 32, [0.485, 0.456, 0.406], [0.229, 0.224, 0.225],
                      train=train, seed=1, **kw)


def test_train_loader_shapes():
    for batch in _loader(train=True):
        assert batch["image"].shape == (2, 3, 32, 32)
        assert batch["label"].shape == (2, 1, 32, 32)
        assert set(np.unique(batch["label"])) <= {0.0, 1.0}


def test_val_loader_batches_all():
    ds = make_synthetic(5, 32, seed=0)
    loader = DataLoader(ds, 1, 32, [0.5] * 3, [0.25] * 3, train=False, seed=1)
    assert sum(b["image"].shape[0] for b in loader) == 5


def test_train_loader_seeded_shuffle():
    a = [b["image"].copy() for b in _loader(train=True)]
    b = [b["image"].copy() for b in _loader(train=True)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
