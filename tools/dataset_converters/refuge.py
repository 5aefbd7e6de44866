#!/usr/bin/env python
"""Prepare REFUGE glaucoma cup/disc segmentation data.

Reference analogue ``tools/dataset_converters/refuge.py``: six zips
(train/val/test x images/annotations); walk the extracted trees (skipping
Illustration/MACOSX), keep .jpg/.bmp; masks remap 0 -> 1 (optic cup),
128 -> 2 (optic disc rim), 255 -> 0 (background).
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os
import tempfile
import zipfile

import numpy as np


def extract_split(zip_path: str, out_dir: str, split: str, kind: str,
                  tmp_root) -> None:
    import cv2
    os.makedirs(osp.join(out_dir, kind, split), exist_ok=True)
    with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
        print('extracting', zip_path)
        zipfile.ZipFile(zip_path).extractall(tmp)
        for cur, dirs, files in os.walk(tmp):
            if dirs or 'Illustration' in cur or 'MACOSX' in cur:
                continue
            for name in sorted(files):
                if not name.endswith(('.jpg', '.bmp')):
                    continue
                img = cv2.imread(osp.join(cur, name))
                if kind == 'annotations':
                    raw = img[:, :, 0]
                    img = np.zeros_like(raw)
                    img[raw == 0] = 1
                    img[raw == 128] = 2
                cv2.imwrite(osp.join(out_dir, kind, split,
                                     osp.splitext(name)[0] + '.png'), img)


def main():
    p = argparse.ArgumentParser(description='REFUGE preparation')
    p.add_argument('--raw_data_root', required=True,
                   help='dir containing the six REFUGE2 zips')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default='data/REFUGE')
    args = p.parse_args()

    # (zip hint, split, kind) — matched by substring against the zip names
    wanted = [('train', 'training'), ('val', 'validation'),
              ('test', 'test')]
    zips = sorted(f for f in os.listdir(args.raw_data_root)
                  if f.endswith('.zip'))
    for name in zips:
        lower = name.lower()
        kind = 'annotations' if ('ann' in lower or 'gt' in lower or
                                 'seg' in lower) else 'images'
        for hint, split in wanted:
            if hint in lower:
                extract_split(osp.join(args.raw_data_root, name),
                              args.out_dir, split, kind, args.tmp_dir)
                break
    print('done')


if __name__ == '__main__':
    main()
