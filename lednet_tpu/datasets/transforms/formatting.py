"""PackSegInputs — the pipeline's terminal transform.

Behavioral spec: reference ``mmseg/datasets/transforms/formatting.py:14``.
The torch version emits a CHW tensor + ``SegDataSample``; here we keep NHWC
numpy (device transfer happens batched in the loader) and a flat meta dict
with the same keys (img_path/ori_shape/img_shape/pad_shape/scale_factor/
flip/flip_direction/reduce_zero_label).
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from lednet_tpu.registry import TRANSFORMS

META_KEYS = ('img_path', 'seg_map_path', 'ori_shape', 'img_shape',
             'pad_shape', 'scale_factor', 'flip', 'flip_direction',
             'reduce_zero_label', 'sample_idx')


@TRANSFORMS.register_module()
class PackSegInputs:
    def __init__(self, meta_keys: Sequence[str] = META_KEYS):
        self.meta_keys = meta_keys

    def __call__(self, results: Dict) -> Dict:
        packed = {}
        img = results['img']
        if img.ndim == 2:
            img = img[..., None]
        packed['inputs'] = np.ascontiguousarray(img)  # HWC, BGR uint8
        if 'gt_seg_map' in results:
            packed['gt_seg_map'] = results['gt_seg_map'].astype(np.int32)
        if 'gt_edge_map' in results:
            packed['gt_edge_map'] = results['gt_edge_map'].astype(np.int32)
        packed['metainfo'] = {k: results.get(k) for k in self.meta_keys
                              if k in results}
        return packed
