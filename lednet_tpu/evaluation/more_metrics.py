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
    """Official-semantics Cityscapes scoring + submission-format PNG dumping.

    The reference (``citys_metric.py:11-158``) writes labelId PNGs and shells
    out to cityscapesscripts' ``evaluateImgLists``; we write the same files
    and score with a native implementation of the official math
    (:mod:`lednet_tpu.evaluation.cityscapes_eval`): per-class/per-category
    IoU in labelId space where false positives on ignored-GT pixels are NOT
    counted — a generic trainId IoU differs whenever the model predicts an
    eval class over void/ignored ground truth.
    """

    def __init__(self, output_dir: Optional[str] = None,
                 to_label_id: bool = True, format_only: bool = False,
                 keep_results: bool = False, **kwargs):
        super().__init__(output_dir=output_dir, format_only=format_only,
                         **kwargs)
        self.to_label_id = to_label_id
        self.keep_results = keep_results
        self._dump_idx = 0
        self._conf = None

    def reset(self):
        super().reset()
        self._conf = None

    def process(self, pred, label, num_classes: int):
        from lednet_tpu.evaluation import cityscapes_eval as cse
        pred_np = np.asarray(pred)
        if pred_np.ndim == 2:
            pred_np = pred_np[None]
        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            import cv2
            for plane in pred_np:
                arr = plane.astype(np.uint8)
                if self.to_label_id:
                    arr = cse.TRAINID_TO_LABELID[arr]
                cv2.imwrite(osp.join(self.output_dir,
                                     f'pred_{self._dump_idx:06d}.png'), arr)
                self._dump_idx += 1
        if not self.format_only:
            # official scoring happens in labelId space; the 19-class
            # trainId->labelId conversion applies to predictions AND labels
            # (ignored train labels land on labelId 0 = unlabeled)
            if num_classes == 19:
                pred_ids = cse.TRAINID_TO_LABELID[pred_np.astype(np.uint8)]
                gt_ids = cse.TRAINID_TO_LABELID[
                    np.asarray(label).astype(np.uint8)]
                conf = cse.confusion(pred_ids, gt_ids)
                self._conf = conf if self._conf is None else self._conf + conf
            # keep the per-class trainId IoU table too (superset of the
            # reference's output); suppress the base class's raw dump
            out_dir, self.output_dir = self.output_dir, None
            try:
                super().process(pred, label, num_classes)
            finally:
                self.output_dir = out_dir

    def compute_metrics(self) -> Dict[str, float]:
        results = {} if self.format_only else super().compute_metrics()
        if self._conf is not None:
            from lednet_tpu.evaluation import cityscapes_eval as cse
            official = cse.scores_from_confusion(self._conf)
            results['averageScoreClasses'] = round(
                100 * official['averageScoreClasses'], 2)
            results['averageScoreCategories'] = round(
                100 * official['averageScoreCategories'], 2)
        return results
