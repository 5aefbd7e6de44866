#!/usr/bin/env python
"""Tile ISPRS Vaihingen aerial imagery into training patches.

Reference analogue ``tools/dataset_converters/vaihingen.py``: same ISPRS
color legend as Potsdam; ``top_mosaic_09cm_area{N}.tif`` tiles are clipped
to 512x512 patches (stride 256), with the official train/val area split.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import glob
import os

from tools.dataset_converters.isaid import tile
from tools.dataset_converters.potsdam import rgb_to_label

TRAIN_AREAS = {'area1', 'area11', 'area13', 'area15', 'area17', 'area21',
               'area23', 'area26', 'area28', 'area3', 'area30', 'area32',
               'area34', 'area37', 'area5', 'area7'}
VAL_AREAS = {'area6', 'area24', 'area35', 'area16', 'area14', 'area22',
             'area10', 'area4', 'area2', 'area20', 'area8', 'area31',
             'area33', 'area27', 'area38', 'area12', 'area29'}


def main():
    p = argparse.ArgumentParser(description='Vaihingen tiling')
    p.add_argument('dataset_path', help='dir with top/ images and gts/')
    p.add_argument('-o', '--out_dir', default='data/vaihingen')
    p.add_argument('--clip_size', type=int, default=512)
    p.add_argument('--stride_size', type=int, default=256)
    args = p.parse_args()
    overlap = args.clip_size - args.stride_size

    import cv2
    for sub in ('img_dir/train', 'img_dir/val', 'ann_dir/train',
                'ann_dir/val'):
        os.makedirs(osp.join(args.out_dir, sub), exist_ok=True)
    images = sorted(glob.glob(osp.join(args.dataset_path, '**',
                                       'top_mosaic*.tif'), recursive=True))
    # ground truth copies live in a parallel tree with the same filenames
    seen = set()
    print(f'tiling {len(images)} mosaics')
    for path in images:
        name = osp.splitext(osp.basename(path))[0]
        area = name.split('_')[-1]
        if area in seen:
            continue
        is_label = 'gts' in path or 'GT' in path or 'label' in path.lower()
        if is_label:
            continue
        seen.add(area)
        split = 'val' if area in VAL_AREAS else 'train'
        img = cv2.imread(path)
        for y, x, t in tile(img, args.clip_size, overlap, pad_val=0):
            cv2.imwrite(osp.join(args.out_dir, 'img_dir', split,
                                 f'{name}_{y}_{x}.png'), t)
        gt_candidates = [q for q in images if q != path and
                         osp.basename(q) == osp.basename(path)]
        if gt_candidates:
            lab = rgb_to_label(cv2.imread(gt_candidates[0])[..., ::-1])
            for y, x, t in tile(lab, args.clip_size, overlap, pad_val=255):
                cv2.imwrite(osp.join(args.out_dir, 'ann_dir', split,
                                     f'{name}_{y}_{x}.png'), t)
    print('done')


if __name__ == '__main__':
    main()
