#!/usr/bin/env python
"""Per-layer feature map visualization.

Reference analogue: ``tools/feature_map_visual.py`` (forward-hook Recorder ->
PCA/heatmap overlays). jax version: ``capture_intermediates=True`` records
every submodule output; selected layers are reduced to a heatmap (channel
mean) and saved as overlays.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description='feature map dump')
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-dir', default='feature_maps')
    p.add_argument('--target-layers', nargs='+', default=['_backbone'],
                   help='substring filters on intermediate paths')
    p.add_argument('--max-maps', type=int, default=16)
    return p.parse_args()


def main():
    args = parse_args()
    import cv2
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.apis import init_model

    runner = init_model(args.config, args.checkpoint)
    img = cv2.imread(args.img)
    x = jnp.asarray(img)[None]
    if runner.preprocessor is not None:
        x, _, _ = runner.preprocessor(x, None, training=False)
    variables = {'params': runner.state.params,
                 'batch_stats': runner.state.batch_stats}
    _, state = runner.model.apply(variables, x, train=False,
                                  capture_intermediates=True,
                                  mutable=['intermediates'])

    os.makedirs(args.out_dir, exist_ok=True)
    count = 0

    def walk(tree, path):
        nonlocal count
        if count >= args.max_maps:
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + '/' + k)
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f'{path}[{i}]')
        elif hasattr(tree, 'ndim') and tree.ndim == 4:
            if not any(t in path for t in args.target_layers):
                return
            heat = np.asarray(jnp.mean(tree[0], axis=-1))
            heat = (heat - heat.min()) / (heat.max() - heat.min() + 1e-9)
            heat = cv2.applyColorMap((heat * 255).astype(np.uint8),
                                     cv2.COLORMAP_JET)
            heat = cv2.resize(heat, (img.shape[1], img.shape[0]))
            overlay = (0.5 * img + 0.5 * heat).astype(np.uint8)
            name = path.strip('/').replace('/', '_') + '.png'
            cv2.imwrite(osp.join(args.out_dir, name), overlay)
            count += 1

    walk(state['intermediates'], '')
    print(f'wrote {count} maps to {args.out_dir}')


if __name__ == '__main__':
    main()
