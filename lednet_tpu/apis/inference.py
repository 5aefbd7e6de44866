"""High-level inference APIs.

Behavioral spec: reference ``mmseg/apis/inference.py:22-186`` —
``init_model`` (config -> build -> load checkpoint -> dataset_meta recovery),
``inference_model`` (test-pipeline minus LoadAnnotations, model.test_step),
``show_result_pyplot`` (palette blend via the visualizer).
"""
from __future__ import annotations

import os.path as osp
from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

import lednet_tpu
from lednet_tpu.config import Config
from lednet_tpu.datasets.basesegdataset import Compose
from lednet_tpu.engine.runner import Runner
from lednet_tpu.engine.state import make_eval_step
from lednet_tpu.models.segmentors.encoder_decoder import postprocess_logits


def init_model(config: Union[str, Config], checkpoint: Optional[str] = None,
               device=None, cfg_options: Optional[dict] = None) -> Runner:
    """Build a model runner from config (+ optional checkpoint)."""
    lednet_tpu.register_all_modules()
    cfg = Config.fromfile(config) if isinstance(config, str) else config
    if cfg_options:
        cfg.merge_from_dict(cfg_options)
    runner = Runner(cfg)
    if checkpoint is not None:
        meta = runner.load(checkpoint)
        runner.dataset_meta = meta.get('dataset_meta', {})
    else:
        runner.init_state()
        runner.dataset_meta = {}
    if not runner.dataset_meta:
        # fall back to the config's dataset class metainfo
        try:
            from lednet_tpu.registry import DATASETS
            ds_cfg = dict(cfg.test_dataloader.dataset)
            ds_cfg['lazy_init'] = True
            ds_cfg.pop('pipeline', None)
            ds = DATASETS.build(dict(ds_cfg, pipeline=[]))
            runner.dataset_meta = ds.metainfo
        except Exception:
            runner.dataset_meta = {}
    return runner


def _prepare_data(imgs, cfg):
    """Reference ``apis/utils.py:12-41``: strip LoadAnnotations; swap the
    loader for ndarray inputs."""
    is_batch = isinstance(imgs, (list, tuple))
    if not is_batch:
        imgs = [imgs]
    pipeline = [dict(t) for t in cfg.test_dataloader.dataset.pipeline]
    pipeline = [t for t in pipeline if t.get('type') != 'LoadAnnotations']
    if isinstance(imgs[0], np.ndarray):
        pipeline[0] = dict(type='LoadImageFromNDArray')
    compose = Compose(pipeline)
    data = []
    for img in imgs:
        item = dict(img=img) if isinstance(img, np.ndarray) \
            else dict(img_path=img)
        item.update(seg_fields=[], label_map=None, reduce_zero_label=False)
        data.append(compose(item))
    return data, is_batch


def _cached_eval_step(runner: Runner):
    """One jitted predict program per runner (rebuilding ``make_eval_step``
    per call would create a fresh jit cache and recompile every frame)."""
    step = getattr(runner, '_eval_step_cache', None)
    if step is None:
        step = make_eval_step(runner.model, runner.preprocessor,
                              mode=runner.test_mode)
        runner._eval_step_cache = step
        runner._forward_calls = 0
    return step


def inference_model(runner: Runner, img,
                    batch_size: int = 1) -> Union[dict, Sequence[dict]]:
    """Run whole-image inference; returns dict(s) with ``pred_sem_seg`` /
    ``seg_logits`` / ``metainfo`` (SegDataSample-lite).

    ``batch_size > 1`` groups same-shape inputs and runs ONE jitted forward
    per group-chunk (the reference inferencer batches its preprocess/forward,
    ``mmseg/apis/mmseg_inferencer.py:27``; on TPU batching also amortizes the
    per-dispatch host round-trip).
    """
    data, is_batch = _prepare_data(img, runner.cfg)
    eval_step = _cached_eval_step(runner)

    # group indices by padded shape so each group stacks into one batch
    groups: dict = {}
    padded = []
    for idx, item in enumerate(data):
        arr = np.asarray(item['inputs'])
        pad_h = (-arr.shape[0]) % 32
        pad_w = (-arr.shape[1]) % 32
        if pad_h or pad_w:
            arr = np.pad(arr, ((0, pad_h), (0, pad_w), (0, 0)))
        padded.append((arr, pad_h, pad_w))
        groups.setdefault(arr.shape, []).append(idx)

    results: list = [None] * len(data)
    for shape, indices in groups.items():
        for c in range(0, len(indices), max(batch_size, 1)):
            chunk = indices[c:c + max(batch_size, 1)]
            inputs = jnp.asarray(np.stack([padded[i][0] for i in chunk]))
            logits = eval_step(runner.state, inputs)
            runner._forward_calls = getattr(runner, '_forward_calls', 0) + 1
            for j, i in enumerate(chunk):
                meta = data[i]['metainfo']
                pad_h, pad_w = padded[i][1], padded[i][2]
                extra_h = logits.shape[1] - (inputs.shape[1] - pad_h)
                extra_w = logits.shape[2] - (inputs.shape[2] - pad_w)
                seg_logits, pred = postprocess_logits(
                    logits[j:j + 1], (extra_h, extra_w),
                    ori_shape=tuple(meta.get('ori_shape') or ()) or None)
                results[i] = dict(pred_sem_seg=np.asarray(pred[0]),
                                  seg_logits=np.asarray(seg_logits[0]),
                                  metainfo=meta)
    return results if is_batch else results[0]


def show_result_pyplot(runner: Runner, img, result, opacity: float = 0.5,
                       out_file: Optional[str] = None, show: bool = False,
                       with_labels: bool = True, save_dir=None, title=''):
    """Blend the prediction over the image (reference ``inference.py:121``)."""
    import cv2
    from lednet_tpu.visualization.local_visualizer import SegLocalVisualizer
    if isinstance(img, str):
        img = cv2.imread(img)
    vis = SegLocalVisualizer(alpha=opacity)
    classes = (runner.dataset_meta or {}).get('classes')
    palette = (runner.dataset_meta or {}).get('palette')
    drawn = vis.draw_sem_seg(img, result['pred_sem_seg'], classes, palette)
    if out_file:
        cv2.imwrite(out_file, drawn)
    return drawn
