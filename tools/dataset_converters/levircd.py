#!/usr/bin/env python
"""Tile the LEVIR-CD change-detection dataset into patches.

Reference analogue ``tools/dataset_converters/levircd.py``: each split
(train/val/test) holds paired ``A/``, ``B/`` images and a binary ``label/``;
all three are clipped into ``clip_size`` patches at ``stride_size`` (edge
tiles shifted inward so coverage is complete); labels are binarized to
{0, 1} via ``// 255``. A/B patches are concatenated channel-wise is the
downstream loader's job — files keep the ``A|B|label`` subdirs.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import glob
import os

from tools.dataset_converters.isaid import tile


def main():
    p = argparse.ArgumentParser(description='LEVIR-CD tiling')
    p.add_argument('dataset_path', help='root with train|val|test/A,B,label')
    p.add_argument('-o', '--out_dir', default='data/LEVIR-CD')
    p.add_argument('--clip_size', type=int, default=256)
    p.add_argument('--stride_size', type=int, default=256)
    args = p.parse_args()
    overlap = args.clip_size - args.stride_size

    import cv2
    for split in ('train', 'val', 'test'):
        for sub in ('A', 'B', 'label'):
            src_dir = osp.join(args.dataset_path, split, sub)
            if not osp.isdir(src_dir):
                continue
            dst_dir = osp.join(args.out_dir, split, sub)
            os.makedirs(dst_dir, exist_ok=True)
            files = sorted(glob.glob(osp.join(src_dir, '*.png')))
            print(f'{split}/{sub}: {len(files)} images')
            for path in files:
                stem = osp.splitext(osp.basename(path))[0]
                if sub == 'label':
                    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE) // 255
                else:
                    img = cv2.imread(path)
                for y, x, t in tile(img, args.clip_size, overlap, pad_val=0):
                    cv2.imwrite(osp.join(dst_dir, f'{stem}_{y}_{x}.png'), t)
    print('done')


if __name__ == '__main__':
    main()
