#!/usr/bin/env python
"""Reorganize the NYU-Depth V2 release for depth estimation.

Reference analogue ``tools/dataset_converters/nyu.py``: the raw archive
carries ``nyu_train.txt``/``nyu_test.txt`` lists of ``<rgb> <sync_depth>``
pairs; move RGB files into ``images/{train,test}`` and depth PNGs into
``annotations/{train,test}`` with the ``/sync_depth`` path segment dropped
from the target name.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os
import shutil
import tempfile
import zipfile


def reorganize(raw_root: str, out_dir: str) -> None:
    for phase in ('train', 'test'):
        os.makedirs(osp.join(out_dir, 'images', phase), exist_ok=True)
        os.makedirs(osp.join(out_dir, 'annotations', phase), exist_ok=True)
        list_path = osp.join(raw_root, f'nyu_{phase}.txt')
        with open(list_path) as f:
            pairs = [line.split()[:2] for line in f if line.strip()]
        print(f'{phase}: {len(pairs)} pairs')
        for rgb, depth in pairs:
            src = osp.join(raw_root, rgb.lstrip('/'))
            if osp.exists(src):
                shutil.move(src, osp.join(out_dir, 'images', phase,
                                          rgb.lstrip('/').replace('/', '_')))
            dsrc = osp.join(raw_root, depth.lstrip('/'))
            if osp.exists(dsrc):
                dst_name = depth.replace('/sync_depth', '')
                shutil.move(dsrc, osp.join(out_dir, 'annotations', phase,
                                           dst_name.lstrip('/').replace('/', '_')))


def main():
    p = argparse.ArgumentParser(description='NYU-Depth V2 preparation')
    p.add_argument('raw_data', help='nyu.zip or the extracted directory')
    p.add_argument('-o', '--out_dir', default='data/nyu')
    args = p.parse_args()

    if args.raw_data.endswith('.zip'):
        with tempfile.TemporaryDirectory() as tmp:
            print('extracting', args.raw_data)
            zipfile.ZipFile(args.raw_data).extractall(tmp)
            entries = os.listdir(tmp)
            root = osp.join(tmp, entries[0]) if len(entries) == 1 else tmp
            reorganize(root, args.out_dir)
    else:
        reorganize(args.raw_data, args.out_dir)
    print('done')


if __name__ == '__main__':
    main()
