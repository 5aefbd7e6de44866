"""IoU metric.

Behavioral spec: reference ``mmseg/evaluation/metrics/iou_metric.py:19-295``:
per-sample ``intersect_and_union`` histograms masked by ``ignore_index``,
summed over the dataset, then IoU/Acc (and optional Dice/Fscore) per class
plus aAcc/mIoU/mAcc aggregates, all in percent rounded to 2 decimals.

TPU-native: the per-batch histogram is a jitted scatter-add on device (and
under a sharded batch the sums reduce across devices automatically); only the
(4, C) count vector comes back to the host per batch — the reference gathers
full per-sample tensors to CPU instead.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import METRICS


@partial(jax.jit, static_argnames=('num_classes', 'ignore_index'))
def intersect_and_union(pred: jnp.ndarray, label: jnp.ndarray,
                        num_classes: int, ignore_index: int = 255):
    """Returns stacked (4, C): intersect, union, pred_area, label_area."""
    valid = label != ignore_index
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    valid = valid.reshape(-1)
    w = valid.astype(jnp.float64) if jax.config.jax_enable_x64 else \
        valid.astype(jnp.float32)
    safe_label = jnp.where(valid, label, 0)
    safe_pred = jnp.where(valid, pred, 0)
    label_area = jnp.zeros(num_classes, w.dtype).at[safe_label].add(w)
    pred_area = jnp.zeros(num_classes, w.dtype).at[safe_pred].add(w)
    inter_w = w * (pred == label)
    intersect = jnp.zeros(num_classes, w.dtype).at[safe_label].add(inter_w)
    union = pred_area + label_area - intersect
    return jnp.stack([intersect, union, pred_area, label_area])


@METRICS.register_module()
class IoUMetric:
    def __init__(self, ignore_index: int = 255,
                 iou_metrics: Sequence[str] = ('mIoU',),
                 nan_to_num: Optional[int] = None, beta: int = 1,
                 collect_device: str = 'cpu', output_dir: Optional[str] = None,
                 format_only: bool = False, prefix: Optional[str] = None,
                 **kwargs):
        self.ignore_index = ignore_index
        self.metrics = list(iou_metrics)
        self.nan_to_num = nan_to_num
        self.beta = beta
        self.output_dir = output_dir
        self.format_only = format_only
        self._totals: Optional[np.ndarray] = None
        self.class_names: Optional[Sequence[str]] = None

    def reset(self):
        self._totals = None

    def process(self, pred, label, num_classes: int):
        if self.output_dir:
            # reference `:output_dir` contract: dump prediction PNGs
            import os
            import cv2
            os.makedirs(self.output_dir, exist_ok=True)
            idx = getattr(self, '_dump_count', 0)
            arr = np.asarray(pred)
            for i in range(arr.shape[0] if arr.ndim == 3 else 1):
                plane = arr[i] if arr.ndim == 3 else arr
                cv2.imwrite(f'{self.output_dir}/pred_{idx + i:06d}.png',
                            plane.astype(np.uint8))
            self._dump_count = idx + (arr.shape[0] if arr.ndim == 3 else 1)
        if self.format_only:
            return
        counts = np.asarray(intersect_and_union(
            jnp.asarray(pred), jnp.asarray(label), num_classes,
            self.ignore_index), np.float64)
        if self._totals is None:
            self._totals = counts
        else:
            self._totals += counts

    def compute_metrics(self) -> Dict[str, float]:
        assert self._totals is not None, 'no samples processed'
        intersect, union, pred_area, label_area = self._totals
        results: Dict[str, float] = {}
        with np.errstate(divide='ignore', invalid='ignore'):
            all_acc = intersect.sum() / label_area.sum()
            results['aAcc'] = _pct(all_acc)
            iou = intersect / union
            acc = intersect / label_area
            per_class = {'IoU': iou, 'Acc': acc}
            if 'mDice' in self.metrics:
                per_class['Dice'] = 2 * intersect / (pred_area + label_area)
            if 'mFscore' in self.metrics:
                precision = intersect / pred_area
                recall = intersect / label_area
                b2 = self.beta ** 2
                fscore = (1 + b2) * precision * recall / (b2 * precision + recall)
                per_class.update(Fscore=fscore, Precision=precision,
                                 Recall=recall)
        for name, vals in per_class.items():
            if self.nan_to_num is not None:
                vals = np.nan_to_num(vals, nan=self.nan_to_num)
            results[f'm{name}'] = _pct(np.nanmean(vals))
        self._per_class = {k: np.round(v * 100, 2) for k, v in per_class.items()}
        return results

    def table(self) -> str:
        """Per-class results table (reference prints a PrettyTable)."""
        names = self.class_names or [str(i) for i in
                                     range(len(next(iter(self._per_class.values()))))]
        cols = ['Class'] + list(self._per_class)
        rows = [[n] + [f'{self._per_class[c][i]:.2f}' for c in self._per_class]
                for i, n in enumerate(names)]
        widths = [max(len(str(r[i])) for r in [cols] + rows) for i in range(len(cols))]
        def fmt(row):
            return ' | '.join(str(v).ljust(w) for v, w in zip(row, widths))
        sep = '-+-'.join('-' * w for w in widths)
        return '\n'.join([fmt(cols), sep] + [fmt(r) for r in rows])


def _pct(v: float) -> float:
    return float(np.round(v * 100, 2))
