#!/usr/bin/env python
"""Tile Potsdam/Vaihingen aerial imagery into training patches.

Reference analogue: ``tools/dataset_converters/potsdam.py`` — split the huge
TIFF tiles into clipped patches and map the RGB label colors to class ids.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import glob
import os

import numpy as np

# ISPRS color -> class id
COLOR_MAP = {
    (255, 255, 255): 0,  # impervious
    (0, 0, 255): 1,      # building
    (0, 255, 255): 2,    # low vegetation
    (0, 255, 0): 3,      # tree
    (255, 255, 0): 4,    # car
    (255, 0, 0): 5,      # clutter
}


def rgb_to_label(rgb):
    out = np.full(rgb.shape[:2], 255, np.uint8)
    for color, idx in COLOR_MAP.items():
        out[(rgb == np.array(color)).all(-1)] = idx
    return out


def main():
    p = argparse.ArgumentParser(description='Potsdam tiling')
    p.add_argument('dataset_path')
    p.add_argument('-o', '--out_dir', default='data/potsdam')
    p.add_argument('--clip_size', type=int, default=512)
    p.add_argument('--stride_size', type=int, default=256)
    args = p.parse_args()

    import cv2
    for sub in ('img_dir/train', 'img_dir/val', 'ann_dir/train',
                'ann_dir/val'):
        os.makedirs(osp.join(args.out_dir, sub), exist_ok=True)
    images = sorted(glob.glob(osp.join(args.dataset_path, '**', '*RGB*.tif'),
                              recursive=True))
    print(f'tiling {len(images)} tiles')
    cs, ss = args.clip_size, args.stride_size
    for path in images:
        img = cv2.imread(path)
        name = osp.splitext(osp.basename(path))[0]
        label_path = path.replace('RGB', 'label')
        label = cv2.imread(label_path) if osp.exists(label_path) else None
        split = 'val' if any(t in name for t in ('2_13', '2_14', '3_13',
                                                 '3_14')) else 'train'
        H, W = img.shape[:2]
        for y in range(0, max(H - cs, 0) + 1, ss):
            for x in range(0, max(W - cs, 0) + 1, ss):
                tile = img[y:y + cs, x:x + cs]
                out = osp.join(args.out_dir, f'img_dir/{split}',
                               f'{name}_{y}_{x}.png')
                cv2.imwrite(out, tile)
                if label is not None:
                    lab = rgb_to_label(label[y:y + cs, x:x + cs][..., ::-1])
                    cv2.imwrite(osp.join(args.out_dir, f'ann_dir/{split}',
                                         f'{name}_{y}_{x}.png'), lab)
    print('done')


if __name__ == '__main__':
    main()
