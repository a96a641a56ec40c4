"""Golden numeric tests for the metric implementations (VERDICT r2 item 7):
HD95 against brute-force surface distances, the confusion family against
hand-computed counts, Dice/IoU against direct formulas on explicit masks — not
just invariants like zero-for-identical.

Reference semantics: MONAI metrics as wired in `/root/reference/train.py:182-192`
and `verify.py:155` (HausdorffDistanceMetric(percentile=95)).
"""

import numpy as np
import pytest

from mm_unet_tpu.train.metrics import (
    ConfusionMatrixMetric, DiceMetric, HausdorffDistanceMetric, MeanIoU,
)


def _brute_hd(a: np.ndarray, b: np.ndarray, percentile: float) -> float:
    """Brute-force symmetric percentile Hausdorff: surface voxels = voxels
    with at least one non-foreground 4-neighbour (equals binary_erosion with
    the default cross structuring element); distances by exhaustive pairwise
    Euclidean metric."""

    def surface(m):
        pad = np.pad(m, 1)
        core = (
            pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2] & pad[1:-1, 2:]
        )
        return m & ~core

    pa = np.argwhere(surface(a))
    pb = np.argwhere(surface(b))
    d_ab = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1)).min(1)
    d_ba = np.sqrt(((pb[:, None, :] - pa[None, :, :]) ** 2).sum(-1)).min(1)
    return float(np.percentile(np.concatenate([d_ab, d_ba]), percentile))


@pytest.mark.parametrize("percentile", [95.0, 100.0])
def test_hd95_matches_bruteforce_random_blobs(percentile):
    rng = np.random.default_rng(0)
    # nontrivial blobs: thresholded smoothed noise
    from scipy import ndimage

    a = ndimage.gaussian_filter(rng.standard_normal((48, 48)), 4) > 0.02
    b = ndimage.gaussian_filter(rng.standard_normal((48, 48)), 4) > 0.05
    assert a.any() and b.any() and (a != b).any()

    m = HausdorffDistanceMetric(percentile=percentile)
    m.update(a[None, None].astype(np.float32), b[None, None].astype(np.float32))
    got = float(m.aggregate()[0])
    want = _brute_hd(a, b, percentile)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hd95_known_offset_squares():
    """Two 4x4 squares offset by 10 pixels horizontally: every surface point
    of one is within [10-3, 10] of the other; max distance 10, and the
    distance multiset is known exactly."""
    a = np.zeros((32, 32), bool)
    b = np.zeros((32, 32), bool)
    a[10:14, 4:8] = True
    b[10:14, 14:18] = True
    m = HausdorffDistanceMetric(percentile=100.0)
    m.update(a[None, None].astype(np.float32), b[None, None].astype(np.float32))
    # 4x4 blocks are all-surface; furthest pair: x=4 vs x=17 -> 13... but
    # distances are nearest-neighbour: surface of a at x=4 to nearest b
    # surface (x=14) = 10; symmetric. Max nearest distance = 10.
    np.testing.assert_allclose(float(m.aggregate()[0]), 10.0, rtol=1e-6)


def test_confusion_family_hand_counts():
    """4x4 single-channel masks with hand-counted TP=2, FP=1, FN=2, TN=11."""
    pred = np.zeros((1, 1, 4, 4), np.float32)
    true = np.zeros((1, 1, 4, 4), np.float32)
    pred[0, 0, 0, 0] = pred[0, 0, 0, 1] = pred[0, 0, 3, 3] = 1  # 3 positive
    true[0, 0, 0, 0] = true[0, 0, 0, 1] = 1                     # shared 2
    true[0, 0, 2, 2] = true[0, 0, 1, 3] = 1                     # missed 2
    tp, fp, fn, tn = 2.0, 1.0, 2.0, 11.0

    expect = {
        "f1 score": 2 * tp / (2 * tp + fp + fn),
        "precision": tp / (tp + fp),
        "recall": tp / (tp + fn),
        "accuracy": (tp + tn) / 16.0,
        "matthews correlation coefficient": (tp * tn - fp * fn)
        / np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
    }
    for name, want in expect.items():
        m = ConfusionMatrixMetric(name)
        m.update(pred, true)
        np.testing.assert_allclose(float(m.aggregate()[0]), want, rtol=1e-12,
                                   err_msg=name)
        # the device-stats path must agree exactly
        m2 = ConfusionMatrixMetric(name)
        m2.update_stats({
            "inter": (pred * true).sum((2, 3)),
            "psum": pred.sum((2, 3)),
            "tsum": true.sum((2, 3)),
            "npix": 16,
        })
        np.testing.assert_allclose(float(m2.aggregate()[0]), want, rtol=1e-12,
                                   err_msg=name + " (stats)")


def test_dice_iou_hand_values():
    """|P|=6, |T|=4, |P∩T|=3 -> dice 2*3/10=0.6, iou 3/7."""
    pred = np.zeros((1, 1, 4, 4), np.float32)
    true = np.zeros((1, 1, 4, 4), np.float32)
    pred[0, 0, 0, :4] = 1
    pred[0, 0, 1, :2] = 1
    true[0, 0, 0, :3] = 1
    true[0, 0, 3, 3] = 1
    d = DiceMetric()
    d.update(pred, true)
    np.testing.assert_allclose(d.aggregate(), [0.6], rtol=1e-12)
    i = MeanIoU()
    i.update(pred, true)
    np.testing.assert_allclose(i.aggregate(), [3.0 / 7.0], rtol=1e-12)


def test_edd_per_class_split_five_channels():
    """5-class (EDD) per-class dice via the stats path matches per-channel
    hand computation — the basis of train.py's per-class breakdown
    (reference `train.py:121-138`)."""
    rng = np.random.default_rng(1)
    pred = (rng.uniform(size=(2, 5, 8, 8)) > 0.5).astype(np.float32)
    true = (rng.uniform(size=(2, 5, 8, 8)) > 0.5).astype(np.float32)
    m = DiceMetric()
    m.update_stats({
        "inter": (pred * true).sum((2, 3)),
        "psum": pred.sum((2, 3)),
        "tsum": true.sum((2, 3)),
        "npix": 64,
    })
    got = m.aggregate()  # (5,) per-class means over samples
    assert got.shape == (5,)
    inter = (pred * true).astype(np.float64).sum((2, 3))
    denom = pred.astype(np.float64).sum((2, 3)) + true.astype(np.float64).sum((2, 3))
    want = np.nanmean(np.where(denom > 0, 2 * inter / denom, np.nan), axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-9)
