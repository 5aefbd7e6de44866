"""Test-time augmentation pipeline wrapper.

Behavioral spec: mmcv's ``TestTimeAug`` as configured by the reference's
``tta_pipeline`` (``configs/_base_/datasets/pascal_voc12.py:27-42``): the
cartesian product of the sub-transform lists (6 scales x 2 flips for LED) is
applied to the raw sample, producing one packed view per combination. The
merge itself (mean softmax over views, reference
``mmseg/models/segmentors/seg_tta.py:15-46``) lives in
``lednet_tpu.models.segmentors.seg_tta``.
"""
from __future__ import annotations

import copy
import itertools
from typing import Dict, List, Sequence

from lednet_tpu.registry import TRANSFORMS


@TRANSFORMS.register_module()
class TestTimeAug:
    def __init__(self, transforms: Sequence[Sequence[Dict]]):
        from lednet_tpu.datasets.basesegdataset import build_pipeline
        self.subpipelines = [build_pipeline(branch) for branch in transforms]

    def __call__(self, results: Dict) -> Dict:
        views: List[Dict] = []
        for combo in itertools.product(*[range(len(b))
                                         for b in self.subpipelines]):
            view = copy.deepcopy(results)
            for branch, idx in zip(self.subpipelines, combo):
                view = branch[idx](view)
                if view is None:
                    break
            if view is not None:
                views.append(view)
        return dict(tta_views=views)
