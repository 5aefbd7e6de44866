#!/usr/bin/env python
"""Prepare the LoveDA remote-sensing dataset.

Reference analogue ``tools/dataset_converters/loveda.py``: unzip
Train.zip / Val.zip / Test.zip; each contains Urban/ and Rural/ scenes with
``images_png`` and ``masks_png``; move both domains' files into flat
``img_dir|ann_dir / train|val|test`` trees (the test split has no masks).
Labels are used as-is (0 = ignore via reduce_zero_label downstream).
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os
import shutil
import tempfile
import zipfile


def main():
    p = argparse.ArgumentParser(description='LoveDA preparation')
    p.add_argument('dataset_path', help='dir containing Train/Val/Test.zip')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default='data/loveDA')
    args = p.parse_args()

    for sub in ('img_dir/train', 'img_dir/val', 'img_dir/test',
                'ann_dir/train', 'ann_dir/val'):
        os.makedirs(osp.join(args.out_dir, sub), exist_ok=True)

    for zip_name, split in (('Train.zip', 'train'), ('Val.zip', 'val'),
                            ('Test.zip', 'test')):
        zip_path = osp.join(args.dataset_path, zip_name)
        if not osp.exists(zip_path):
            print('skipping missing', zip_path)
            continue
        with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
            print('extracting', zip_path)
            zipfile.ZipFile(zip_path).extractall(tmp)
            root = osp.join(tmp, zip_name[:-4])
            if not osp.isdir(root):
                root = tmp
            for domain in ('Urban', 'Rural'):
                for kind, dst_root in (('images_png', 'img_dir'),
                                       ('masks_png', 'ann_dir')):
                    if split == 'test' and kind == 'masks_png':
                        continue
                    src = osp.join(root, domain, kind)
                    if not osp.isdir(src):
                        continue
                    dst = osp.join(args.out_dir, dst_root, split)
                    for name in sorted(os.listdir(src)):
                        shutil.move(osp.join(src, name),
                                    osp.join(dst, name))
    print('done')


if __name__ == '__main__':
    main()
