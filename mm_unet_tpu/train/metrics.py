"""Segmentation metrics — MONAI-semantics clones.

Mirrors the reference metric dict (`/root/reference/train.py:182-192`):
DiceMetric (mean over batch per channel, NaN-aware), MeanIoU,
ConfusionMatrixMetric family (f1 / precision / recall / MCC / accuracy —
confusion counts summed over the epoch, metric computed at aggregate, like
MONAI `compute_sample=False`), and HausdorffDistanceMetric(percentile=95)
(`verify.py:155`) via scipy distance transforms.

Note: the reference indexes `MeanIoU.aggregate()[0]`, which under
reduction="mean_channel" reads only the FIRST sample's IoU — a quirk, not a
semantic (SURVEY.md §8-adjacent); here MeanIoU reports the true mean.

Inputs are thresholded binary masks shaped (B, C, H, W) (post_trans =
sigmoid -> threshold 0.5, `train.py:193-195`). Updates accept JAX or numpy
arrays; accumulation is host-side numpy (cheap at these sizes).
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


class Metric:
    def reset(self):
        raise NotImplementedError

    def update(self, y_pred, y):
        raise NotImplementedError

    def update_stats(self, stats: dict):
        """Accumulate from device-computed sufficient statistics
        (`mm_unet_tpu.train.trainer.seg_stats`): {inter, psum, tsum: (B, C)
        arrays; npix: int}. Arrays are kept lazy (device handles) and only
        materialized at `aggregate()` — one host sync per epoch instead of
        one per step."""
        raise NotImplementedError

    def aggregate(self):
        raise NotImplementedError

    def __call__(self, y_pred, y):
        self.update(y_pred, y)


class DiceMetric(Metric):
    """Per-sample-per-channel Dice; aggregate = NaN-aware mean over samples,
    per channel (MONAI reduction=MEAN_BATCH, get_not_nans=True)."""

    def __init__(self, include_background: bool = True):
        self.include_background = include_background
        self.reset()

    def reset(self):
        self.vals: list[np.ndarray] = []
        self._pending: list[tuple] = []

    def update(self, y_pred, y):
        p = _np(y_pred).astype(np.float64)
        t = _np(y).astype(np.float64)
        if not self.include_background:
            p, t = p[:, 1:], t[:, 1:]
        dims = tuple(range(2, p.ndim))
        inter = (p * t).sum(dims)
        denom = p.sum(dims) + t.sum(dims)
        with np.errstate(invalid="ignore"):
            dice = np.where(denom > 0, 2 * inter / denom, np.nan)
        self.vals.append(dice)

    def update_stats(self, stats: dict):
        self._pending.append(
            (stats["inter"], stats["psum"], stats["tsum"], stats.get("weight"))
        )

    def _drain(self):
        for inter, psum, tsum, w in self._pending:
            inter = _np(inter).astype(np.float64)
            denom = _np(psum).astype(np.float64) + _np(tsum).astype(np.float64)
            if w is not None:  # drop shard_batch pad rows
                keep = _np(w) > 0
                inter, denom = inter[keep], denom[keep]
            if not self.include_background and inter.shape[1] > 1:
                inter, denom = inter[:, 1:], denom[:, 1:]
            with np.errstate(invalid="ignore"):
                self.vals.append(np.where(denom > 0, 2 * inter / denom, np.nan))
        self._pending = []

    def aggregate(self) -> np.ndarray:
        self._drain()
        vals = np.concatenate(self.vals, axis=0)  # (N, C)
        with np.errstate(invalid="ignore"):
            return np.nanmean(vals, axis=0)  # (C,)


class MeanIoU(Metric):
    def __init__(self, include_background: bool = True):
        self.include_background = include_background
        self.reset()

    def reset(self):
        self.vals: list[np.ndarray] = []
        self._pending: list[tuple] = []

    def update(self, y_pred, y):
        p = _np(y_pred).astype(np.float64)
        t = _np(y).astype(np.float64)
        if not self.include_background:
            p, t = p[:, 1:], t[:, 1:]
        dims = tuple(range(2, p.ndim))
        inter = (p * t).sum(dims)
        union = p.sum(dims) + t.sum(dims) - inter
        with np.errstate(invalid="ignore"):
            iou = np.where(union > 0, inter / union, np.nan)
        self.vals.append(iou.mean(axis=1))  # mean_channel

    def update_stats(self, stats: dict):
        self._pending.append(
            (stats["inter"], stats["psum"], stats["tsum"], stats.get("weight"))
        )

    def _drain(self):
        for inter, psum, tsum, w in self._pending:
            inter = _np(inter).astype(np.float64)
            union = _np(psum).astype(np.float64) + _np(tsum).astype(np.float64) - inter
            if w is not None:  # drop shard_batch pad rows
                keep = _np(w) > 0
                inter, union = inter[keep], union[keep]
            if not self.include_background and inter.shape[1] > 1:
                inter, union = inter[:, 1:], union[:, 1:]
            with np.errstate(invalid="ignore"):
                self.vals.append(np.where(union > 0, inter / union, np.nan).mean(axis=1))
        self._pending = []

    def aggregate(self) -> np.ndarray:
        self._drain()
        with np.errstate(invalid="ignore"):
            return np.asarray([np.nanmean(np.concatenate(self.vals))])


class ConfusionMatrixMetric(Metric):
    """Epoch-accumulated confusion counts -> metric per channel."""

    METRICS = ("f1 score", "precision", "recall", "accuracy",
               "matthews correlation coefficient")

    def __init__(self, metric_name: str, include_background: bool = True):
        if metric_name not in self.METRICS:
            raise ValueError(metric_name)
        self.metric_name = metric_name
        self.include_background = include_background
        self.reset()

    def reset(self):
        self.tp = self.fp = self.tn = self.fn = 0.0
        self._pending: list[tuple] = []

    def update(self, y_pred, y):
        p = _np(y_pred).astype(np.float64)
        t = _np(y).astype(np.float64)
        if not self.include_background:
            p, t = p[:, 1:], t[:, 1:]
        dims = (0,) + tuple(range(2, p.ndim))  # sum over batch + spatial
        self.tp = self.tp + (p * t).sum(dims)
        self.fp = self.fp + (p * (1 - t)).sum(dims)
        self.fn = self.fn + ((1 - p) * t).sum(dims)
        self.tn = self.tn + ((1 - p) * (1 - t)).sum(dims)

    def update_stats(self, stats: dict):
        self._pending.append(
            (stats["inter"], stats["psum"], stats["tsum"], stats["npix"],
             stats.get("weight"))
        )

    def _drain(self):
        for inter, psum, tsum, npix, w in self._pending:
            inter = _np(inter).astype(np.float64)
            psum = _np(psum).astype(np.float64)
            tsum = _np(tsum).astype(np.float64)
            if w is not None:  # drop shard_batch pad rows
                keep = _np(w) > 0
                inter, psum, tsum = inter[keep], psum[keep], tsum[keep]
            if not self.include_background and inter.shape[1] > 1:
                inter, psum, tsum = inter[:, 1:], psum[:, 1:], tsum[:, 1:]
            self.tp = self.tp + inter.sum(0)
            self.fp = self.fp + (psum - inter).sum(0)
            self.fn = self.fn + (tsum - inter).sum(0)
            self.tn = self.tn + (npix - psum - tsum + inter).sum(0)
        self._pending = []

    def aggregate(self) -> np.ndarray:
        self._drain()
        tp, fp, tn, fn = self.tp, self.fp, self.tn, self.fn

        def _div(num, den):
            # MONAI compute_confusion_matrix_metric: 0/0 -> nan (e.g.
            # precision with no positive predictions), like the reference's
            # val loop observes; pinned by tests/test_val_parity.py
            num, den = np.asarray(num, np.float64), np.asarray(den, np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                return np.where(den != 0, num / np.where(den != 0, den, 1.0),
                                np.nan)

        name = self.metric_name
        if name == "f1 score":
            v = _div(2 * tp, 2 * tp + fp + fn)
        elif name == "precision":
            v = _div(tp, tp + fp)
        elif name == "recall":
            v = _div(tp, tp + fn)
        elif name == "accuracy":
            v = _div(tp + tn, tp + tn + fp + fn)
        else:  # MCC
            num = tp * tn - fp * fn
            den = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
            v = _div(num, den)
        return np.atleast_1d(v)


class HausdorffDistanceMetric(Metric):
    """Symmetric percentile Hausdorff distance on binary masks
    (MONAI semantics; reference `verify.py:155` uses percentile=95)."""

    def __init__(self, include_background: bool = True, percentile: float = 95.0):
        self.include_background = include_background
        self.percentile = percentile
        self.reset()

    def reset(self):
        self.vals: list[float] = []

    def _surface_distances(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        from scipy import ndimage

        if not a.any() or not b.any():
            return np.array([np.nan])
        # surface voxels of a = a minus its erosion
        ae = a & ~ndimage.binary_erosion(a)
        dt_b = ndimage.distance_transform_edt(~(b & ~ndimage.binary_erosion(b)))
        return dt_b[ae]

    def update(self, y_pred, y):
        p = _np(y_pred).astype(bool)
        t = _np(y).astype(bool)
        if not self.include_background and p.shape[1] > 1:
            p, t = p[:, 1:], t[:, 1:]
        for n in range(p.shape[0]):
            for c in range(p.shape[1]):
                d_pt = self._surface_distances(p[n, c], t[n, c])
                d_tp = self._surface_distances(t[n, c], p[n, c])
                d = np.concatenate([d_pt, d_tp])
                self.vals.append(
                    float(np.percentile(d, self.percentile))
                    if np.isfinite(d).all() and d.size
                    else np.nan
                )

    def aggregate(self) -> np.ndarray:
        with np.errstate(invalid="ignore"):
            return np.asarray([np.nanmean(self.vals)])


def build_metrics(include_background: bool = True) -> dict[str, Metric]:
    """The reference's 7-metric dict (`train.py:182-192`)."""
    return {
        "dice_metric": DiceMetric(include_background),
        "miou_metric": MeanIoU(include_background),
        "f1": ConfusionMatrixMetric("f1 score", include_background),
        "precision": ConfusionMatrixMetric("precision", include_background),
        "recall": ConfusionMatrixMetric("recall", include_background),
        "MCC": ConfusionMatrixMetric("matthews correlation coefficient", include_background),
        "ACC": ConfusionMatrixMetric("accuracy", include_background),
    }
