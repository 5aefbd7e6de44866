#!/usr/bin/env python
"""Merge SBD (benchmark_RELEASE) augmented annotations into VOC2012 trainaug.

Reference analogue: ``tools/dataset_converters/voc_aug.py`` — converts SBD
.mat segmentations to PNG and writes the combined trainaug split list.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os
from concurrent.futures import ThreadPoolExecutor


def parse_args():
    p = argparse.ArgumentParser(description='VOC aug (SBD) converter')
    p.add_argument('devkit_path', help='VOCdevkit root')
    p.add_argument('aug_path', help='benchmark_RELEASE root')
    p.add_argument('-o', '--out_dir', default=None)
    p.add_argument('--nproc', type=int, default=8)
    return p.parse_args()


def convert_mat(mat_path, out_png):
    from scipy.io import loadmat
    import cv2
    import numpy as np
    mat = loadmat(mat_path)
    seg = mat['GTcls'][0]['Segmentation'][0].astype(np.uint8)
    cv2.imwrite(out_png, seg)


def main():
    args = parse_args()
    voc = osp.join(args.devkit_path, 'VOC2012')
    out_dir = args.out_dir or osp.join(voc, 'SegmentationClassAug')
    os.makedirs(out_dir, exist_ok=True)
    mat_dir = osp.join(args.aug_path, 'dataset', 'cls')
    names = [f[:-4] for f in os.listdir(mat_dir) if f.endswith('.mat')]
    print(f'converting {len(names)} SBD annotations')
    with ThreadPoolExecutor(max_workers=args.nproc) as pool:
        list(pool.map(lambda n: convert_mat(osp.join(mat_dir, n + '.mat'),
                                            osp.join(out_dir, n + '.png')),
                      names))
    # trainaug list = train + SBD minus val
    split_dir = osp.join(voc, 'ImageSets', 'Segmentation')
    with open(osp.join(split_dir, 'train.txt')) as f:
        train = set(f.read().split())
    with open(osp.join(split_dir, 'val.txt')) as f:
        val = set(f.read().split())
    trainaug = sorted((train | set(names)) - val)
    with open(osp.join(split_dir, 'trainaug.txt'), 'w') as f:
        f.write('\n'.join(trainaug))
    print(f'wrote {len(trainaug)} ids to trainaug.txt')


if __name__ == '__main__':
    main()
