#!/usr/bin/env python
"""Confusion matrix from saved predictions or a fresh eval run.

Reference analogue: ``tools/analysis_tools/confusion_matrix.py`` (pkl results
-> matrix -> matplotlib plot). Here the matrix is computed on device during a
test pass (no intermediate pkl needed) and optionally plotted.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import json
import os
import os.path as osp

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='confusion matrix')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('save_dir', help='directory to save the matrix/plot')
    p.add_argument('--show', action='store_true')
    p.add_argument('--color-theme', default='winter')
    p.add_argument('--title', default='Normalized Confusion Matrix')
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def compute_confusion(runner, num_classes: int):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from lednet_tpu.datasets.loader import build_dataloader
    from lednet_tpu.engine.state import make_eval_step
    from lednet_tpu.models.segmentors.encoder_decoder import postprocess_logits

    @partial(jax.jit, static_argnames=('n',))
    def bincount2d(pred, label, n):
        valid = label != 255
        idx = jnp.where(valid, label * n + pred, 0).reshape(-1)
        w = valid.reshape(-1).astype(jnp.float32)
        return jnp.zeros(n * n, jnp.float32).at[idx].add(w).reshape(n, n)

    loader = build_dataloader(dict(runner.cfg.test_dataloader),
                              default_batch_size=1)
    eval_step = make_eval_step(runner.model, runner.preprocessor,
                               mode=runner.test_mode)
    total = np.zeros((num_classes, num_classes), np.float64)
    for batch in loader:
        inputs = jnp.asarray(batch['inputs'])
        pad_h = (-inputs.shape[1]) % 32
        pad_w = (-inputs.shape[2]) % 32
        if pad_h or pad_w:
            inputs = jnp.pad(inputs, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        logits = eval_step(runner.state, inputs)
        meta = batch['metainfo'][0]
        extra_h = logits.shape[1] - (inputs.shape[1] - pad_h)
        extra_w = logits.shape[2] - (inputs.shape[2] - pad_w)
        _, pred = postprocess_logits(
            logits, (extra_h, extra_w),
            ori_shape=tuple(meta.get('ori_shape') or ()) or None)
        total += np.asarray(bincount2d(pred, jnp.asarray(batch['gt_seg_map']),
                                       num_classes))
    return total


def main():
    args = parse_args()
    import lednet_tpu
    from lednet_tpu.config import Config
    from lednet_tpu.engine.runner import Runner

    lednet_tpu.register_all_modules()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(kv.split('=', 1) for kv in args.cfg_options))
    runner = Runner(cfg, work_dir=args.save_dir)
    if args.checkpoint:
        runner.load(args.checkpoint)
    else:
        runner.init_state()

    from lednet_tpu.registry import DATASETS
    ds_cfg = dict(cfg.test_dataloader.dataset)
    ds_cfg['pipeline'] = []
    ds = DATASETS.build(dict(ds_cfg, lazy_init=True))
    classes = ds.metainfo.get('classes', ())
    num_classes = len(classes) or 2

    matrix = compute_confusion(runner, num_classes)
    os.makedirs(args.save_dir, exist_ok=True)
    np.save(osp.join(args.save_dir, 'confusion_matrix.npy'), matrix)
    norm = matrix / np.maximum(matrix.sum(axis=1, keepdims=True), 1) * 100

    print('row = ground truth, col = prediction (%)')
    header = ' ' * 16 + ' '.join(f'{c[:10]:>10}' for c in classes)
    print(header)
    for name, row in zip(classes, norm):
        print(f'{name[:14]:>14}: ' + ' '.join(f'{v:10.2f}' for v in row))

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        im = ax.imshow(norm, cmap=args.color_theme)
        plt.colorbar(im)
        ax.set_title(args.title)
        ax.set_xlabel('Prediction')
        ax.set_ylabel('Ground Truth')
        fig.savefig(osp.join(args.save_dir, 'confusion_matrix.png'), dpi=150)
        print(f'saved to {args.save_dir}/confusion_matrix.png')
    except Exception as e:
        print(f'plot skipped: {e}')


if __name__ == '__main__':
    main()
