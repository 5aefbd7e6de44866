#!/usr/bin/env python
"""Visually check the training pipeline output.

Reference analogue: ``tools/analysis_tools/browse_dataset.py`` — runs the
configured train pipeline on N samples and saves image+label overlays so
augmentation bugs are visible.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os


def main():
    p = argparse.ArgumentParser(description='browse the train pipeline')
    p.add_argument('config')
    p.add_argument('--output-dir', default='browse_out')
    p.add_argument('--num-samples', type=int, default=8)
    p.add_argument('--opacity', type=float, default=0.5)
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()

    import cv2
    import numpy as np
    import lednet_tpu
    from lednet_tpu.config import Config
    from lednet_tpu.registry import DATASETS
    from lednet_tpu.visualization import SegLocalVisualizer

    lednet_tpu.register_all_modules()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(kv.split('=', 1) for kv in args.cfg_options))
    ds = DATASETS.build(dict(cfg.train_dataloader.dataset))
    vis = SegLocalVisualizer(alpha=args.opacity)
    os.makedirs(args.output_dir, exist_ok=True)
    meta = ds.metainfo
    for i in range(min(args.num_samples, len(ds))):
        item = ds[i]
        img = np.asarray(item['inputs'])
        drawn = img
        if 'gt_seg_map' in item:
            drawn = vis.draw_sem_seg(img, np.asarray(item['gt_seg_map']),
                                     meta.get('classes'), meta.get('palette'))
        cv2.imwrite(osp.join(args.output_dir, f'sample_{i}.png'), drawn)
    print(f'wrote samples to {args.output_dir}')


if __name__ == '__main__':
    main()
