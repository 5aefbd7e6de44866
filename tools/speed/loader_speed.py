#!/usr/bin/env python
"""Input-pipeline throughput rig: can the loader keep the chip fed?

The train step at 512^2 bs=8 measures ~3.3-5 ms on one v5e (bench.py), i.e.
the chip consumes 1600-2400 img/s. The reference feeds GPUs with
multi-process torch DataLoader workers; our loader is a thread pool
(``lednet_tpu/datasets/loader.py``), which is GIL-bound for heavy Python
transforms — this rig measures by how much, for

  (a) the reference-shaped python pipeline (LoadImageFromFile ->
      LoadAnnotations -> RandomResize -> RandomCrop(cat_max_ratio) ->
      RandomFlip -> PhotoMetricDistortion -> PackSegInputs), and
  (b) the fused path (FusedRandomResizeCropFlip: one C++/numpy pass doing
      resize+crop+flip, photometrics folded into the on-device
      preprocessor) used by the default branch config.

Prints one JSON line per variant: batches/s, img/s, and the feed ratio vs
--train-step-ms (>1 means the loader outruns the chip). Interpret against
``os.cpu_count()`` (also printed): cv2's big ops release the GIL, so the
thread pool scales with real cores — a 1-core tunnel dev box measures the
per-core cost (~8-13 img/s for Cityscapes-sized sources), and a v5e-8 host
(~112 vCPUs, 14 per chip) multiplies that by its core count.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description='loader throughput rig')
    p.add_argument('--data-root', default=None,
                   help='existing VOC-layout dataset; default: fabricate a '
                        'synthetic one in /tmp')
    p.add_argument('--num-images', type=int, default=48)
    p.add_argument('--image-size', type=int, nargs=2, default=[1024, 2048],
                   metavar=('H', 'W'),
                   help='fabricated source image size (Cityscapes-like)')
    p.add_argument('--crop-size', type=int, default=512)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--num-workers', type=int, nargs='+', default=[1, 4, 8])
    p.add_argument('--num-batches', type=int, default=40)
    p.add_argument('--train-step-ms', type=float, default=4.0,
                   help='device train-step time to compare against '
                        '(bench.py train_step_512_bs8_ms)')
    return p.parse_args()


def fabricate(root, n, h, w):
    import cv2
    import numpy as np
    img_dir = osp.join(root, 'img')
    ann_dir = osp.join(root, 'ann')
    os.makedirs(img_dir, exist_ok=True), os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(f'{img_dir}/{i:03d}.png',
                    rng.integers(0, 255, (h, w, 3), np.uint8))
        cv2.imwrite(f'{ann_dir}/{i:03d}.png',
                    rng.integers(0, 19, (h, w), np.uint8))
    return root


def pipelines(crop):
    python_pipe = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='RandomResize', scale=(2048, 1024), ratio_range=(0.5, 2.0),
             keep_ratio=True),
        dict(type='RandomCrop', crop_size=(crop, crop), cat_max_ratio=0.75),
        dict(type='RandomFlip', prob=0.5),
        dict(type='PhotoMetricDistortion'),
        dict(type='PackSegInputs'),
    ]
    fused_pipe = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='FusedRandomResizeCropFlip', scale=(2048, 1024),
             ratio_range=(0.5, 2.0), crop_size=(crop, crop),
             cat_max_ratio=0.75, flip_prob=0.5),
        dict(type='PackSegInputs'),
    ]
    return dict(python=python_pipe, fused=fused_pipe)


def main():
    args = parse_args()
    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.datasets.loader import DataLoader
    from lednet_tpu.registry import DATASETS

    root = args.data_root or fabricate(
        '/tmp/_loader_speed_data', args.num_images, *args.image_size)

    print(json.dumps(dict(host_cpu_count=os.cpu_count(),
                          train_step_ms=args.train_step_ms)))
    chip_img_s = args.batch_size / (args.train_step_ms / 1e3)
    for name, pipe in pipelines(args.crop_size).items():
        ds = DATASETS.build(dict(
            type='BaseSegDataset', data_root=root,
            data_prefix=dict(img_path='img', seg_map_path='ann'),
            img_suffix='.png', seg_map_suffix='.png',
            metainfo=dict(classes=tuple(str(i) for i in range(19))),
            pipeline=pipe))
        for nw in args.num_workers:
            loader = DataLoader(ds, batch_size=args.batch_size,
                                num_workers=nw, infinite=False)
            # warmup one epoch pass to touch the page cache
            it = iter(loader)
            next(it)
            t0 = time.perf_counter()
            n = 0
            while n < args.num_batches:
                for batch in loader:
                    n += 1
                    if n >= args.num_batches:
                        break
            dt = time.perf_counter() - t0
            img_s = n * args.batch_size / dt
            print(json.dumps(dict(
                pipeline=name, num_workers=nw,
                batches_per_s=round(n / dt, 2),
                img_per_s=round(img_s, 1),
                feed_ratio_vs_chip=round(img_s / chip_img_s, 3))))


if __name__ == '__main__':
    main()
