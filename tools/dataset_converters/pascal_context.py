#!/usr/bin/env python
"""Prepare PASCAL-Context 60-class annotations.

Reference analogue ``tools/dataset_converters/pascal_context.py``: decodes
``trainval_merged.json`` with the PASCAL-in-Detail API ("detail" package)
into per-image 60-class label PNGs plus train/val split lists. The detail
package is not part of this image, so the CLI gates on it with a clear
message instead of crashing mid-run.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description='PASCAL-Context preparation')
    p.add_argument('devkit_path', help='VOCdevkit root')
    p.add_argument('json_path', help='trainval_merged.json')
    p.add_argument('-o', '--out_dir', default=None)
    args = p.parse_args()

    try:
        from detail import Detail
    except ImportError:
        raise SystemExit(
            'pascal_context.py requires the PASCAL-in-Detail API '
            '("detail" package, github.com/zhanghang1989/detail-api), '
            'which is not installed in this image.')

    voc_root = osp.join(args.devkit_path, 'VOC2010')
    out_dir = args.out_dir or osp.join(voc_root, 'SegmentationClassContext')
    os.makedirs(out_dir, exist_ok=True)
    import cv2

    for split in ('train', 'val'):
        det = Detail(args.json_path, osp.join(voc_root, 'JPEGImages'), split)
        mapping = {raw: i + 1 for i, raw in enumerate(sorted(
            c['category_id'] for c in det.getCats()))}
        names = []
        for img in det.getImgs():
            raw = det.getMask(img)
            out = np.zeros_like(raw, np.uint8)
            for rid, tid in mapping.items():
                out[raw == rid] = tid
            stem = osp.splitext(img['file_name'])[0]
            cv2.imwrite(osp.join(out_dir, stem + '.png'), out)
            names.append(stem)
        list_dir = osp.join(voc_root, 'ImageSets', 'SegmentationContext')
        os.makedirs(list_dir, exist_ok=True)
        with open(osp.join(list_dir, f'{split}.txt'), 'w') as f:
            f.write('\n'.join(sorted(names)))
    print('done')


if __name__ == '__main__':
    main()
