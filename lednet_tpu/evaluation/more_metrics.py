"""DepthMetric and CityscapesMetric.

Behavioral specs: reference ``mmseg/evaluation/metrics/depth_metric.py``
(RMSE/RMSE_log/AbsRel/SqRel/log10/delta-accuracy over valid-depth pixels) and
``citys_metric.py`` (writes official label-ID PNGs; the reference shells out
to cityscapesscripts for scoring — we score with the built-in IoU instead and
still write the submission-format files).
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional, Sequence

import numpy as np

from lednet_tpu.evaluation.iou_metric import IoUMetric
from lednet_tpu.registry import METRICS

# trainId -> official cityscapes labelId
TRAINID_TO_LABELID = np.array(
    [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32,
     33], np.uint8)


@METRICS.register_module()
class DepthMetric:
    def __init__(self, depth_metrics: Optional[Sequence[str]] = None,
                 min_depth_eval: float = 0.0, max_depth_eval: float = np.inf,
                 crop_type: Optional[str] = None, depth_scale_factor: float = 1.0,
                 collect_device: str = 'cpu', output_dir: Optional[str] = None,
                 format_only: bool = False, prefix: Optional[str] = None,
                 **kwargs):
        self.min_depth = min_depth_eval
        self.max_depth = max_depth_eval
        self.metrics = depth_metrics or ['d1', 'd2', 'd3', 'abs_rel',
                                         'sq_rel', 'rmse', 'rmse_log',
                                         'log10', 'silog']
        self._records: List[Dict[str, float]] = []
        self.class_names = None

    def reset(self):
        self._records = []

    def process(self, pred, gt, num_classes=None):
        pred = np.asarray(pred, np.float64).reshape(-1)
        gt = np.asarray(gt, np.float64).reshape(-1)
        valid = (gt > self.min_depth) & (gt < self.max_depth)
        p, g = np.maximum(pred[valid], 1e-6), np.maximum(gt[valid], 1e-6)
        if p.size == 0:
            return
        thresh = np.maximum(g / p, p / g)
        diff = p - g
        diff_log = np.log(p) - np.log(g)
        rec = dict(
            d1=float(np.mean(thresh < 1.25)),
            d2=float(np.mean(thresh < 1.25 ** 2)),
            d3=float(np.mean(thresh < 1.25 ** 3)),
            abs_rel=float(np.mean(np.abs(diff) / g)),
            sq_rel=float(np.mean(diff ** 2 / g)),
            rmse=float(np.sqrt(np.mean(diff ** 2))),
            rmse_log=float(np.sqrt(np.mean(diff_log ** 2))),
            log10=float(np.mean(np.abs(np.log10(p) - np.log10(g)))),
            silog=float(np.sqrt(np.mean(diff_log ** 2) -
                                0.5 * np.mean(diff_log) ** 2)),
        )
        self._records.append(rec)

    def compute_metrics(self) -> Dict[str, float]:
        assert self._records, 'no samples processed'
        return {m: round(float(np.mean([r[m] for r in self._records])), 4)
                for m in self.metrics}

    def table(self) -> str:
        res = self.compute_metrics()
        return ' | '.join(f'{k}: {v}' for k, v in res.items())


@METRICS.register_module()
class CityscapesMetric(IoUMetric):
    """IoU scoring + official submission-format label-ID PNG dumping."""

    def __init__(self, output_dir: Optional[str] = None,
                 to_label_id: bool = True, format_only: bool = False,
                 keep_results: bool = False, **kwargs):
        super().__init__(output_dir=output_dir, format_only=format_only,
                         **kwargs)
        self.to_label_id = to_label_id
        self.keep_results = keep_results
        self._dump_idx = 0

    def process(self, pred, label, num_classes: int):
        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            import cv2
            arr = np.asarray(pred[0] if np.asarray(pred).ndim == 3 else pred,
                             np.uint8)
            if self.to_label_id:
                arr = TRAINID_TO_LABELID[np.clip(arr, 0,
                                                 len(TRAINID_TO_LABELID) - 1)]
            cv2.imwrite(osp.join(self.output_dir,
                                 f'pred_{self._dump_idx:06d}.png'), arr)
            self._dump_idx += 1
        if not self.format_only:
            # suppress the base class's raw-trainId dump (ours wrote the
            # official labelId files above)
            out_dir, self.output_dir = self.output_dir, None
            try:
                super().process(pred, label, num_classes)
            finally:
                self.output_dir = out_dir
