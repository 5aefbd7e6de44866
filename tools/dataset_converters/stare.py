#!/usr/bin/env python
"""Prepare STARE retina-vessel data.

Reference analogue ``tools/dataset_converters/stare.py``: three tarballs
(stare-images.tar, labels-ah.tar, labels-vk.tar) of gzipped .ppm files;
gunzip each member, first 10 sorted entries -> training, rest -> validation;
both label sets land in the same annotations tree, masks ``// 128``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import gzip
import os
import shutil
import tarfile
import tempfile

from tools.dataset_converters._common import (make_split_dirs,
                                              write_binary_mask)

TRAINING_LEN = 10


def _extract_tar_of_gz(tar_path: str, tmp: str) -> str:
    gz_dir = osp.join(tmp, 'gz')
    os.makedirs(gz_dir, exist_ok=True)
    with tarfile.open(tar_path) as f:
        f.extractall(gz_dir, filter='data')
    out = osp.join(tmp, 'files')
    os.makedirs(out, exist_ok=True)
    for name in os.listdir(gz_dir):
        dst = osp.join(out, osp.splitext(name)[0])  # strip .gz
        with gzip.open(osp.join(gz_dir, name), 'rb') as src, \
                open(dst, 'wb') as f:
            shutil.copyfileobj(src, f)
    shutil.rmtree(gz_dir)
    return out


def _convert(tar_path: str, out_dir: str, kind: str, tmp_root):
    import cv2
    with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
        print('extracting', tar_path)
        files = _extract_tar_of_gz(tar_path, tmp)
        names = sorted(os.listdir(files))
        for i, name in enumerate(names):
            split = 'training' if i < TRAINING_LEN else 'validation'
            stem = osp.splitext(name)[0]
            img = cv2.imread(osp.join(files, name))
            dst = osp.join(out_dir, kind, split, stem + '.png')
            if kind == 'images':
                cv2.imwrite(dst, img)
            else:
                write_binary_mask(img, dst)


def main():
    p = argparse.ArgumentParser(description='STARE preparation')
    p.add_argument('image_path', help='path of stare-images.tar')
    p.add_argument('labels_ah', help='path of labels-ah.tar')
    p.add_argument('labels_vk', help='path of labels-vk.tar')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default=osp.join('data', 'STARE'))
    args = p.parse_args()

    make_split_dirs(args.out_dir)
    _convert(args.image_path, args.out_dir, 'images', args.tmp_dir)
    _convert(args.labels_ah, args.out_dir, 'annotations', args.tmp_dir)
    _convert(args.labels_vk, args.out_dir, 'annotations', args.tmp_dir)
    print('done')


if __name__ == '__main__':
    main()
