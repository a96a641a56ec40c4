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


def test_edd_and_vessel_dir_loading(tmp_path):
    """Directory-structure loaders: DRIVE-style pairing and EDD 5-class masks."""
    import os

    from PIL import Image

    from mm_unet_tpu.data.loaders import _load_edd, _load_vessel
    from mm_unet_tpu.utils.config import ConfigDict

    # DRIVE-style tree
    root = tmp_path / "drive"
    for phase, pat in (("train", "{b}.png"), ("val", "{b}_manual1.png")):
        os.makedirs(root / phase / "input")
        os.makedirs(root / phase / "label")
        for i in range(2):
            Image.new("RGB", (16, 16), (100, 50, 20)).save(root / phase / "input" / f"im{i}.png")
            Image.new("L", (16, 16), 255).save(root / phase / "label" / pat.format(b=f"im{i}"))
    cfg = ConfigDict(
        trainer=dict(dataset_choose="DRIVE", train_ratio=0.8),
        dataset=dict(DRIVE=dict(data_root=str(root), batch_size=2, image_size=16)),
    )
    tr, va = _load_vessel(cfg, "DRIVE")
    assert len(tr) == 2 and len(va) == 2
    assert tr.images[0].shape == (16, 16, 3)

    # EDD-style tree
    eroot = tmp_path / "edd"
    os.makedirs(eroot / "originalImages")
    os.makedirs(eroot / "masks")
    Image.new("RGB", (16, 16)).save(eroot / "originalImages" / "a.png")
    Image.new("L", (16, 16), 255).save(eroot / "masks" / "a_BE.tif")
    Image.new("L", (16, 16), 255).save(eroot / "masks" / "a_polyp.tif")
    ecfg = ConfigDict(
        trainer=dict(dataset_choose="EDD_seg", train_ratio=1.0),
        dataset=dict(EDD_seg=dict(data_root=str(eroot), batch_size=1, image_size=16)),
    )
    tr, va = _load_edd(ecfg)
    assert len(tr) == 1
    assert tr.labels[0].shape == (16, 16, 5)
    assert tr.labels[0][..., 0].max() == 1.0  # BE present
    assert tr.labels[0][..., 1].max() == 0.0  # cancer absent
    assert tr.labels[0][..., 3].max() == 1.0  # polyp present


def test_clahe_improves_contrast():
    from mm_unet_tpu.data import transforms as T

    rng = np.random.default_rng(0)
    # low-contrast image
    img = (0.45 + 0.05 * rng.random((64, 64, 3))).astype(np.float32)
    out = T.clahe(img)
    assert out.shape == img.shape
    assert out.std() > img.std()  # contrast expanded
    assert out.min() >= 0 and out.max() <= 1


def test_patch_training_loader():
    from mm_unet_tpu.data.loaders import DataLoader, make_synthetic

    ds = make_synthetic(4, 64, seed=0)
    loader = DataLoader(ds, 2, 64, [0.5] * 3, [0.25] * 3, train=True, seed=1,
                        patch_size=32)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 3, 32, 32)
    assert batch["label"].shape == (2, 1, 32, 32)


def test_gated_augmentations_run():
    from mm_unet_tpu.data.loaders import DataLoader, make_synthetic

    ds = make_synthetic(4, 32, seed=0)
    loader = DataLoader(ds, 2, 32, [0.5] * 3, [0.25] * 3, train=True, seed=1,
                        resized_crop=True, color_jitter=True, gaussian_blur=True)
    for batch in loader:
        assert np.isfinite(batch["image"]).all()
