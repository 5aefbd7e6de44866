"""Fused native geometric augmentation.

Drop-in replacement for the RandomResize -> RandomCrop -> RandomFlip chain of
the canonical train pipeline (``configs/_base_/datasets/*``): samples the
exact same distributions (uniform ratio against (w, h) ``scale`` with
keep-ratio rescale; uniform crop origin with the ``cat_max_ratio`` re-draw
loop; flip coin), then executes resize+crop+flip as ONE native memory pass
per array (lednet_tpu/native/augment.cpp) instead of three python/cv2 steps
with intermediate full-size buffers.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from lednet_tpu import native
from lednet_tpu.registry import TRANSFORMS


@TRANSFORMS.register_module()
class FusedRandomResizeCropFlip:
    def __init__(self, scale: Tuple[int, int], crop_size: Tuple[int, int],
                 ratio_range: Tuple[float, float] = (0.5, 2.0),
                 cat_max_ratio: float = 1.0, flip_prob: float = 0.5,
                 ignore_index: int = 255):
        self.scale = scale          # (w, h), mmcv convention
        self.crop_size = crop_size  # (h, w)
        self.ratio_range = ratio_range
        self.cat_max_ratio = cat_max_ratio
        self.flip_prob = flip_prob
        self.ignore_index = ignore_index

    def _sample_geometry(self, h: int, w: int):
        lo, hi = self.ratio_range
        ratio = np.random.random_sample() * (hi - lo) + lo
        target = (int(self.scale[0] * ratio), int(self.scale[1] * ratio))
        max_long, max_short = max(target), min(target)
        f = min(max_long / max(h, w), max_short / min(h, w))
        rw, rh = int(w * f + 0.5), int(h * f + 0.5)
        ch = min(self.crop_size[0], rh)
        cw = min(self.crop_size[1], rw)
        cy = np.random.randint(0, max(rh - ch, 0) + 1)
        cx = np.random.randint(0, max(rw - cw, 0) + 1)
        flip = np.random.rand() < self.flip_prob
        return rh, rw, cy, cx, ch, cw, flip

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        gt = results.get('gt_seg_map')

        geo = self._sample_geometry(h, w)
        if self.cat_max_ratio < 1.0 and gt is not None:
            for _ in range(10):
                rh, rw, cy, cx, ch, cw, flip = geo
                crop = native.fused_resize_crop_flip(
                    gt.astype(np.uint8), (rh, rw), (cy, cx), (ch, cw),
                    flip=False, nearest=True)
                labels, cnt = np.unique(crop, return_counts=True)
                cnt = cnt[labels != self.ignore_index]
                if len(cnt) > 1 and cnt.max() / cnt.sum() < self.cat_max_ratio:
                    break
                # re-draw only the crop origin (reference semantics)
                cy = np.random.randint(0, max(rh - ch, 0) + 1)
                cx = np.random.randint(0, max(rw - cw, 0) + 1)
                geo = (rh, rw, cy, cx, ch, cw, flip)

        rh, rw, cy, cx, ch, cw, flip = geo
        results['img'] = native.fused_resize_crop_flip(
            img, (rh, rw), (cy, cx), (ch, cw), flip, nearest=False)
        results['img_shape'] = (ch, cw)
        results['scale_factor'] = (rw / w, rh / h)
        results['flip'] = bool(flip)
        results['flip_direction'] = 'horizontal' if flip else None
        for key in results.get('seg_fields', []):
            arr = results[key]
            out = native.fused_resize_crop_flip(
                arr.astype(np.uint8), (rh, rw), (cy, cx), (ch, cw), flip,
                nearest=True)
            results[key] = out.astype(arr.dtype)
        return results
