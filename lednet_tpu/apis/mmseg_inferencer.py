"""Batched high-level inferencer.

Behavioral spec: reference ``mmseg/apis/mmseg_inferencer.py:27`` —
``MMSegInferencer(model, weights).__call__(imgs, ...)`` runs
preprocess -> forward -> visualize -> postprocess and returns a dict with
``predictions`` (HxW class arrays) and optional ``visualization`` images;
``out_dir``/``pred_out_dir`` dump results to disk.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import List, Optional, Sequence, Union

import numpy as np

from lednet_tpu.apis.inference import (inference_model, init_model,
                                       show_result_pyplot)
from lednet_tpu.registry import INFERENCERS


@INFERENCERS.register_module()
class MMSegInferencer:
    def __init__(self, model: Union[str, dict], weights: Optional[str] = None,
                 classes=None, palette=None, dataset_name: Optional[str] = None,
                 device=None, scope: str = 'lednet_tpu'):
        self.runner = init_model(model, weights)
        if classes is not None or palette is not None:
            meta = dict(self.runner.dataset_meta or {})
            if classes is not None:
                meta['classes'] = classes
            if palette is not None:
                meta['palette'] = palette
            self.runner.dataset_meta = meta

    def __call__(self, inputs, return_datasamples: bool = False,
                 batch_size: int = 1, show: bool = False,
                 out_dir: str = '', img_out_dir: str = 'vis',
                 pred_out_dir: str = 'pred', return_vis: bool = False,
                 opacity: float = 0.8, with_labels: bool = True, **kwargs):
        single = not isinstance(inputs, (list, tuple))
        imgs = [inputs] if single else list(inputs)
        # batched preprocess->forward (reference batches too,
        # ``mmseg_inferencer.py:27``): same-shape inputs share one jitted
        # forward per batch_size chunk
        results = inference_model(self.runner, imgs,
                                  batch_size=max(int(batch_size), 1))
        predictions: List[np.ndarray] = []
        visualizations: List[np.ndarray] = []
        for i, (img, result) in enumerate(zip(imgs, results)):
            pred = np.asarray(result['pred_sem_seg'])
            predictions.append(pred)
            need_vis = return_vis or bool(out_dir) or show
            if need_vis:
                vis = show_result_pyplot(self.runner, img, result,
                                         opacity=opacity)
                if out_dir:
                    os.makedirs(osp.join(out_dir, img_out_dir), exist_ok=True)
                    import cv2
                    name = osp.basename(img) if isinstance(img, str) \
                        else f'{i}.png'
                    cv2.imwrite(osp.join(out_dir, img_out_dir, name), vis)
                if return_vis:
                    visualizations.append(vis)
            if out_dir:
                os.makedirs(osp.join(out_dir, pred_out_dir), exist_ok=True)
                name = (osp.splitext(osp.basename(img))[0]
                        if isinstance(img, str) else str(i)) + '.png'
                import cv2
                cv2.imwrite(osp.join(out_dir, pred_out_dir, name),
                            pred.astype(np.uint8))
        out = dict(predictions=predictions[0] if single else predictions)
        if return_vis:
            out['visualization'] = (visualizations[0] if single
                                    else visualizations)
        return out
