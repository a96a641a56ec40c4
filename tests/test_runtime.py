"""Native C++ data-pipeline tests: builds the shared library and checks the
primitives against numpy references and the batch path end-to-end."""

import numpy as np
import pytest

from mm_unet_tpu import runtime


@pytest.fixture(scope="module")
def lib():
    lib = runtime.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_resize_nearest_matches_numpy(lib):
    rng = np.random.default_rng(0)
    src = rng.standard_normal((7, 9, 3)).astype(np.float32)
    out = runtime.resize_nearest(src, 14, 18)
    # our numpy nearest: index (y+0.5)*sh/dh
    ys = np.minimum(((np.arange(14) + 0.5) * 7 / 14).astype(int), 6)
    xs = np.minimum(((np.arange(18) + 0.5) * 9 / 18).astype(int), 8)
    want = src[ys][:, xs]
    np.testing.assert_array_equal(out, want)


def test_resize_bilinear_identity(lib):
    rng = np.random.default_rng(1)
    src = rng.standard_normal((8, 8, 3)).astype(np.float32)
    out = runtime.resize_bilinear(src, 8, 8)
    np.testing.assert_allclose(out, src, rtol=1e-6, atol=1e-6)


def test_resize_bilinear_downscale_mean(lib):
    src = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = runtime.resize_bilinear(src, 2, 2)
    # half-pixel bilinear 2x downscale = 2x2 block means
    want = src.reshape(2, 2, 2, 2).mean(axis=(1, 3))[..., None]
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_prepare_batch_eval_matches_numpy(lib):
    rng = np.random.default_rng(2)
    images = [rng.random((16, 16, 3)).astype(np.float32) for _ in range(3)]
    labels = [(rng.random((16, 16)) > 0.7).astype(np.float32) for _ in range(3)]
    mean, std = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
    out_img, out_lbl = runtime.prepare_batch(
        images, labels, np.arange(3), 16, mean, std, seed=0, epoch=0, train=False
    )
    assert out_img.shape == (3, 3, 16, 16)
    for i in range(3):
        want = (images[i] - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
        np.testing.assert_allclose(out_img[i], want.transpose(2, 0, 1), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(out_lbl[i, 0], labels[i])


def test_prepare_batch_train_deterministic(lib):
    rng = np.random.default_rng(3)
    images = [rng.random((20, 20, 3)).astype(np.float32) for _ in range(4)]
    labels = [(rng.random((20, 20)) > 0.5).astype(np.float32) for _ in range(4)]
    args = (images, labels, np.arange(4), 16, [0.5] * 3, [0.25] * 3)
    a_img, a_lbl = runtime.prepare_batch(*args, seed=7, epoch=1, train=True)
    b_img, b_lbl = runtime.prepare_batch(*args, seed=7, epoch=1, train=True)
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_lbl, b_lbl)
    c_img, _ = runtime.prepare_batch(*args, seed=8, epoch=1, train=True)
    assert not np.array_equal(a_img, c_img)


def test_prepare_batch_augmented_configs(lib):
    """v2 native path: jitter/blur/patch/resized-crop/cutmix all run and
    produce sane outputs (deterministic per seed)."""
    rng = np.random.default_rng(5)
    images = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(2)]
    labels = [(rng.random((32, 32)) > 0.7).astype(np.float32) for _ in range(2)]
    donors_i = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(2)]
    donors_l = [(rng.random((32, 32)) > 0.7).astype(np.float32) for _ in range(2)]
    mean, std = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
    kw = dict(
        mean=mean, std=std, seed=7, epoch=1, train=True,
        cutmix_donor_images=donors_i, cutmix_donor_labels=donors_l,
        color_jitter=True, gaussian_blur=True, resized_crop=True, patch=16,
    )
    img1, lbl1 = runtime.prepare_batch(images, labels, np.arange(2), 16, **kw)
    img2, lbl2 = runtime.prepare_batch(images, labels, np.arange(2), 16, **kw)
    assert img1.shape == (2, 3, 16, 16) and lbl1.shape == (2, 1, 16, 16)
    np.testing.assert_array_equal(img1, img2)  # deterministic
    np.testing.assert_array_equal(lbl1, lbl2)
    assert np.isfinite(img1).all()
    assert set(np.unique(lbl1)) <= {0.0, 1.0}


def test_loader_native_path_used_with_augmentations(lib):
    """The DataLoader keeps the native fast path under augmented configs."""
    from mm_unet_tpu.data.loaders import DataLoader, make_synthetic

    ds = make_synthetic(4, 32, seed=0)
    loader = DataLoader(
        ds, 2, 32, [0.485, 0.456, 0.406], [0.229, 0.224, 0.225], train=True,
        seed=0, cutmix=True, color_jitter=True, gaussian_blur=True,
        resized_crop=True, prefetch_depth=0,
    )
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 3, 32, 32)
    native = loader._native_batch(np.array([0, 1]), epoch=0)
    assert native is not None  # fast path no longer bails on augmentation
