"""Segmentation visualizer.

Behavioral spec: reference ``mmseg/visualization/local_visualizer.py`` — the
fork draws ONLY class 1 in pure red [255, 0, 0] at alpha 0.5 over the image
(vs the pristine palette blend in ``local_visualizer_原版.py``). Both modes
are provided: ``branch_red_mode`` reproduces the fork, palette mode is the
upstream behavior.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from lednet_tpu.registry import VISUALIZERS

# default palette used when a dataset provides none
_DEFAULT_PALETTE = [
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
    [0, 0, 230], [119, 11, 32]]


@VISUALIZERS.register_module()
class SegLocalVisualizer:
    def __init__(self, name: str = 'visualizer', alpha: float = 0.5,
                 branch_red_mode: bool = False, vis_backends=None,
                 save_dir: Optional[str] = None, **kwargs):
        self.alpha = alpha
        self.branch_red_mode = branch_red_mode
        self.save_dir = save_dir

    def draw_sem_seg(self, image: np.ndarray, sem_seg: np.ndarray,
                     classes: Optional[Sequence[str]] = None,
                     palette: Optional[Sequence[Sequence[int]]] = None
                     ) -> np.ndarray:
        """image: HWC BGR uint8; sem_seg: HW int. Returns blended BGR."""
        sem_seg = np.asarray(sem_seg)
        image = np.asarray(image)
        if self.branch_red_mode or (classes is not None and len(classes) == 2):
            # fork behavior: only class 1, pure red (BGR [0,0,255])
            mask = sem_seg == 1
            color = np.zeros_like(image)
            color[..., 2] = 255
            out = image.copy()
            blended = (image * (1 - self.alpha) + color * self.alpha)
            out[mask] = blended[mask].astype(np.uint8)
            return out
        if palette is None:
            n = int(sem_seg.max()) + 1 if sem_seg.size else 1
            palette = (_DEFAULT_PALETTE * (n // len(_DEFAULT_PALETTE) + 1))[:n]
        palette_arr = np.asarray(palette, np.uint8)[..., ::-1]  # RGB->BGR
        color = palette_arr[np.clip(sem_seg, 0, len(palette_arr) - 1)]
        return (image * (1 - self.alpha) + color * self.alpha).astype(np.uint8)

    def add_datasample(self, name, image, data_sample=None, draw_gt=False,
                       draw_pred=True, show=False, out_file=None, **kwargs):
        pred = data_sample.get('pred_sem_seg') if isinstance(data_sample, dict) \
            else data_sample
        drawn = self.draw_sem_seg(image, pred)
        if out_file:
            import cv2
            cv2.imwrite(out_file, drawn)
        return drawn
