"""3-D volumetric pipeline tests: NIfTI round-trip, BraTS label conversion,
pos/neg crop semantics."""

import gzip
import struct

import numpy as np

from mm_unet_tpu.data import volumetric as V


def _write_nifti(path, data):
    """Minimal NIfTI-1 writer for the reader test."""
    header = bytearray(352)
    struct.pack_into("<i", header, 0, 348)
    dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<h", header, 70, 16)  # float32
    struct.pack_into("<h", header, 72, 32)  # bitpix
    struct.pack_into("<f", header, 108, 352.0)  # vox_offset
    payload = bytes(header) + np.asfortranarray(data.astype(np.float32)).tobytes(order="F")
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((5, 6, 7)).astype(np.float32)
    p = tmp_path / "x.nii.gz"
    _write_nifti(p, vol)
    got = V.read_nifti(str(p))
    np.testing.assert_allclose(got, vol, rtol=1e-6)


def test_brats_label_conversion():
    lbl = np.zeros((4, 4, 4), np.float32)
    lbl[0, 0, 0] = 1  # NCR -> TC, WT
    lbl[1, 1, 1] = 2  # ED -> WT
    lbl[2, 2, 2] = 4  # ET -> TC, WT, ET
    out = V.convert_brats_labels(lbl)
    assert out.shape == (3, 4, 4, 4)
    assert out[0, 0, 0, 0] == 1 and out[1, 0, 0, 0] == 1 and out[2, 0, 0, 0] == 0
    assert out[0, 1, 1, 1] == 0 and out[1, 1, 1, 1] == 1
    assert out[2, 2, 2, 2] == 1 and out[0, 2, 2, 2] == 1


def test_rand_crop_pos_neg_shapes_and_fg():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((4, 32, 32, 32)).astype(np.float32)
    lbl = np.zeros((3, 32, 32, 32), np.float32)
    lbl[:, 16, 16, 16] = 1
    crops = V.rand_crop_pos_neg(rng, img, lbl, roi=(16, 16, 16), pos=1, neg=0,
                                num_samples=4)
    assert len(crops) == 4
    for ci, cl in crops:
        assert ci.shape == (4, 16, 16, 16) and cl.shape == (3, 16, 16, 16)
        assert cl.any()  # pos-only sampling must contain the foreground voxel


def test_rand_crop_pads_small_volumes():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    lbl = np.zeros((1, 8, 8, 8), np.float32)
    (ci, cl), = V.rand_crop_pos_neg(rng, img, lbl, roi=(16, 16, 16))
    assert ci.shape == (1, 16, 16, 16)


def test_normalize_intensity_nonzero():
    img = np.zeros((1, 4, 4, 4), np.float32)
    img[0, :2] = np.arange(32, dtype=np.float32).reshape(2, 4, 4) + 1
    out = V.normalize_intensity(img)
    nz = out[0][img[0] != 0]
    np.testing.assert_allclose(nz.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(nz.std(), 1.0, atol=1e-4)
    assert (out[0][img[0] == 0] == 0).all()
