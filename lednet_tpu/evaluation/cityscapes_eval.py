"""Official Cityscapes pixel-level evaluation semantics, implemented natively.

The reference shells out to ``cityscapesscripts``
(``/root/reference/mmseg/evaluation/metrics/citys_metric.py:11-158``,
``CSEval.evaluateImgLists``); that package is a C-accelerated dependency we
replace with a vectorized numpy implementation of the SAME math
(the official ``evalPixelLevelSemanticLabeling`` algorithm):

- scoring happens in **labelId** space (the 34-label table below, a public
  factual constant of the dataset spec);
- per-class IoU: ``tp = conf[l, l]``, ``fn = row(l) - tp``, and — the part a
  generic IoU gets wrong — ``fp`` counts ONLY rows whose GT label is not
  ignore-in-eval (predictions on void/ignored GT pixels are free);
- per-category IoU: same with rows/cols merged over the category's
  non-ignored labels, fp from non-ignored rows *outside* the category;
- instance-weighted iIoU (when ``*_instanceIds.png`` files are supplied):
  each GT instance's tp/fn weighted by ``avg_class_size / instance_size``,
  fp taken from the pixel-level matrix.

Divergence (documented): official iIoU uses fixed train-set average instance
sizes baked into cityscapesscripts; pass ``avg_class_size`` to reproduce
those, otherwise averages are computed from the supplied instance files.
"""
from __future__ import annotations

from collections import namedtuple
from typing import Dict, List, Optional, Sequence

import numpy as np

Label = namedtuple('Label', ['name', 'id', 'train_id', 'category',
                             'has_instances', 'ignore_in_eval'])

# The official 34-label Cityscapes table (labels.py of the dataset spec).
LABELS = [
    Label('unlabeled', 0, 255, 'void', False, True),
    Label('ego vehicle', 1, 255, 'void', False, True),
    Label('rectification border', 2, 255, 'void', False, True),
    Label('out of roi', 3, 255, 'void', False, True),
    Label('static', 4, 255, 'void', False, True),
    Label('dynamic', 5, 255, 'void', False, True),
    Label('ground', 6, 255, 'void', False, True),
    Label('road', 7, 0, 'flat', False, False),
    Label('sidewalk', 8, 1, 'flat', False, False),
    Label('parking', 9, 255, 'flat', False, True),
    Label('rail track', 10, 255, 'flat', False, True),
    Label('building', 11, 2, 'construction', False, False),
    Label('wall', 12, 3, 'construction', False, False),
    Label('fence', 13, 4, 'construction', False, False),
    Label('guard rail', 14, 255, 'construction', False, True),
    Label('bridge', 15, 255, 'construction', False, True),
    Label('tunnel', 16, 255, 'construction', False, True),
    Label('pole', 17, 5, 'object', False, False),
    Label('polegroup', 18, 255, 'object', False, True),
    Label('traffic light', 19, 6, 'object', False, False),
    Label('traffic sign', 20, 7, 'object', False, False),
    Label('vegetation', 21, 8, 'nature', False, False),
    Label('terrain', 22, 9, 'nature', False, False),
    Label('sky', 23, 10, 'sky', False, False),
    Label('person', 24, 11, 'human', True, False),
    Label('rider', 25, 12, 'human', True, False),
    Label('car', 26, 13, 'vehicle', True, False),
    Label('truck', 27, 14, 'vehicle', True, False),
    Label('bus', 28, 15, 'vehicle', True, False),
    Label('caravan', 29, 255, 'vehicle', True, True),
    Label('trailer', 30, 255, 'vehicle', True, True),
    Label('train', 31, 16, 'vehicle', True, False),
    Label('motorcycle', 32, 17, 'vehicle', True, False),
    Label('bicycle', 33, 18, 'vehicle', True, False),
]

N_IDS = 34
ID2LABEL = {l.id: l for l in LABELS}
EVAL_IDS = [l.id for l in LABELS if not l.ignore_in_eval]
CATEGORIES = sorted({l.category for l in LABELS if l.category != 'void'})
# trainId -> labelId lookup (the submission-format conversion)
TRAINID_TO_LABELID = np.zeros(256, np.uint8)
for _l in LABELS:
    if _l.train_id != 255:
        TRAINID_TO_LABELID[_l.train_id] = _l.id


def confusion(pred_ids: np.ndarray, gt_ids: np.ndarray) -> np.ndarray:
    """34x34 labelId confusion matrix; rows = GT, cols = prediction."""
    pred = np.asarray(pred_ids).reshape(-1).astype(np.int64)
    gt = np.asarray(gt_ids).reshape(-1).astype(np.int64)
    ok = (gt >= 0) & (gt < N_IDS) & (pred >= 0) & (pred < N_IDS)
    return np.bincount(gt[ok] * N_IDS + pred[ok],
                       minlength=N_IDS * N_IDS).reshape(N_IDS, N_IDS)


def class_iou(conf: np.ndarray) -> Dict[str, float]:
    """Official per-class IoU (``getIouScoreForLabel`` semantics)."""
    not_ignored = np.array(EVAL_IDS)
    scores = {}
    for lid in EVAL_IDS:
        tp = float(conf[lid, lid])
        fn = float(conf[lid, :].sum()) - tp
        rows = not_ignored[not_ignored != lid]
        fp = float(conf[rows, lid].sum())
        denom = tp + fp + fn
        scores[ID2LABEL[lid].name] = tp / denom if denom > 0 else float('nan')
    return scores


def category_iou(conf: np.ndarray) -> Dict[str, float]:
    """Official per-category IoU (``getIouScoreForCategory`` semantics)."""
    scores = {}
    for cat in CATEGORIES:
        in_cat = [l.id for l in LABELS
                  if l.category == cat and not l.ignore_in_eval]
        out_rows = [l.id for l in LABELS
                    if l.category != cat and not l.ignore_in_eval]
        sub = conf[np.ix_(in_cat, in_cat)]
        tp = float(sub.sum())
        fn = float(conf[in_cat, :].sum()) - tp
        fp = float(conf[np.ix_(out_rows, in_cat)].sum())
        denom = tp + fp + fn
        scores[cat] = tp / denom if denom > 0 else float('nan')
    return scores


def _nanmean(values) -> float:
    vals = [v for v in values if not np.isnan(v)]
    return float(np.mean(vals)) if vals else float('nan')


def instance_stats(pred_ids: np.ndarray, inst_ids: np.ndarray,
                   tp_w: Dict[str, float], fn_w: Dict[str, float],
                   sizes: Dict[str, List[int]]) -> None:
    """Accumulate per-instance tp/fn pixel counts + sizes for one image.

    ``inst_ids`` is the official ``*_instanceIds.png`` encoding:
    ``labelId * 1000 + index`` for pixels of instance-having labels.
    Weighted later once the dataset-average sizes are known.
    """
    inst = np.asarray(inst_ids).astype(np.int64)
    pred = np.asarray(pred_ids).astype(np.int64)
    for inst_id in np.unique(inst[inst >= 1000]):
        label = ID2LABEL.get(inst_id // 1000)
        if label is None or label.ignore_in_eval or not label.has_instances:
            continue
        mask = inst == inst_id
        size = int(mask.sum())
        tp = int((pred[mask] == label.id).sum())
        sizes.setdefault(label.name, []).append(size)
        # store raw (tp, fn, size) triples; weighting happens in finalize
        tp_w.setdefault(label.name, []).append((tp, size))


def evaluate_img_lists(pred_list: Sequence[str], gt_list: Sequence[str],
                       inst_list: Optional[Sequence[str]] = None,
                       avg_class_size: Optional[Dict[str, float]] = None
                       ) -> Dict[str, object]:
    """Native ``CSEval.evaluateImgLists``: score written labelId PNG pairs."""
    import cv2
    conf = np.zeros((N_IDS, N_IDS), np.int64)
    raw_inst: Dict[str, List] = {}
    sizes: Dict[str, List[int]] = {}
    for i, (pred_path, gt_path) in enumerate(zip(pred_list, gt_list)):
        pred = cv2.imread(str(pred_path), cv2.IMREAD_UNCHANGED)
        gt = cv2.imread(str(gt_path), cv2.IMREAD_UNCHANGED)
        if pred is None or gt is None:
            raise FileNotFoundError(f'{pred_path} / {gt_path}')
        if pred.shape != gt.shape:
            raise ValueError(
                f'shape mismatch: {pred.shape} vs {gt.shape} ({pred_path})')
        conf += confusion(pred, gt)
        if inst_list is not None:
            inst = cv2.imread(str(inst_list[i]), cv2.IMREAD_UNCHANGED)
            if inst is not None:
                instance_stats(pred, inst, raw_inst, {}, sizes)
    return scores_from_confusion(conf, raw_inst, sizes, avg_class_size)


def scores_from_confusion(conf: np.ndarray,
                          raw_inst: Optional[Dict[str, List]] = None,
                          sizes: Optional[Dict[str, List[int]]] = None,
                          avg_class_size: Optional[Dict[str, float]] = None
                          ) -> Dict[str, object]:
    """Assemble the official result dict from the accumulated statistics."""
    cls = class_iou(conf)
    cat = category_iou(conf)
    out: Dict[str, object] = {
        'classScores': cls,
        'categoryScores': cat,
        'averageScoreClasses': _nanmean(cls.values()),
        'averageScoreCategories': _nanmean(cat.values()),
    }
    inst_cls: Dict[str, float] = {}
    if raw_inst:
        not_ignored = np.array(EVAL_IDS)
        for name, triples in raw_inst.items():
            label = next(l for l in LABELS if l.name == name)
            avg = (avg_class_size or {}).get(name) or \
                float(np.mean(sizes[name]))
            tp_w = sum(tp * (avg / size) for tp, size in triples)
            fn_w = sum((size - tp) * (avg / size) for tp, size in triples)
            rows = not_ignored[not_ignored != label.id]
            fp = float(conf[rows, label.id].sum())
            denom = tp_w + fp + fn_w
            inst_cls[name] = tp_w / denom if denom > 0 else float('nan')
        out['instClassScores'] = inst_cls
        out['averageScoreInstClasses'] = _nanmean(inst_cls.values())
        # instance categories: human + vehicle (the instance-having ones)
        inst_cat = {}
        for cat_name in ('human', 'vehicle'):
            members = [inst_cls[l.name] for l in LABELS
                       if l.category == cat_name and l.name in inst_cls]
            if members:
                inst_cat[cat_name] = _nanmean(members)
        out['instCategoryScores'] = inst_cat
        out['averageScoreInstCategories'] = _nanmean(inst_cat.values())
    else:
        out['averageScoreInstClasses'] = float('nan')
        out['averageScoreInstCategories'] = float('nan')
    return out
