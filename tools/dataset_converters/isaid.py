#!/usr/bin/env python
"""Prepare iSAID aerial instance-segmentation data for semantic training.

Reference analogue ``tools/dataset_converters/isaid.py``: the semantic GT
ships as ``*_instance_color_RGB.png`` with a fixed 16-color palette; images
and labels are tiled into ``patch x patch`` crops with ``overlap`` (edge
tiles are shifted inward so the whole image is covered; images smaller than
a patch are padded — 0 for images, 255 for labels). Output layout:
``img_dir|ann_dir / train|val``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import glob
import os

import numpy as np

# class id -> RGB color of the official semantic masks
ISAID_PALETTE = np.array([
    (0, 0, 0), (0, 0, 63), (0, 63, 63), (0, 63, 0), (0, 63, 127),
    (0, 63, 191), (0, 63, 255), (0, 127, 63), (0, 127, 127), (0, 0, 127),
    (0, 0, 191), (0, 0, 255), (0, 191, 127), (0, 127, 191), (0, 127, 255),
    (0, 100, 155)], np.uint8)


def color_to_label(rgb: np.ndarray) -> np.ndarray:
    """RGB semantic mask -> class-id map (unknown colors -> 0)."""
    out = np.zeros(rgb.shape[:2], np.uint8)
    for idx, color in enumerate(ISAID_PALETTE):
        out[(rgb == color).all(-1)] = idx
    return out


def _tile_starts(full: int, patch: int, stride: int):
    """Stride-spaced starts, last tile shifted flush to the edge."""
    if full <= patch:
        return [0]
    starts = list(range(0, full - patch, stride))
    starts.append(full - patch)
    return starts


def tile(arr: np.ndarray, patch: int, overlap: int, pad_val: int):
    h, w = arr.shape[:2]
    if h < patch or w < patch:
        pad = [(0, max(patch - h, 0)), (0, max(patch - w, 0))]
        pad += [(0, 0)] * (arr.ndim - 2)
        arr = np.pad(arr, pad, constant_values=pad_val)
        h, w = arr.shape[:2]
    stride = patch - overlap
    for y in _tile_starts(h, patch, stride):
        for x in _tile_starts(w, patch, stride):
            yield y, x, arr[y:y + patch, x:x + patch]


def main():
    p = argparse.ArgumentParser(description='iSAID tiling')
    p.add_argument('dataset_path',
                   help='root with train|val|test / images [+ Semantic_masks]')
    p.add_argument('-o', '--out_dir', default='data/iSAID')
    p.add_argument('--patch_width', type=int, default=896)
    p.add_argument('--patch_height', type=int, default=896)
    p.add_argument('--overlap_area', type=int, default=384)
    args = p.parse_args()
    patch, overlap = args.patch_width, args.overlap_area

    import cv2
    for split in ('train', 'val', 'test'):
        img_glob = osp.join(args.dataset_path, split, 'images', '*.png')
        images = [f for f in sorted(glob.glob(img_glob))
                  if 'instance_color' not in f and 'instance_id' not in f]
        if not images:
            continue
        os.makedirs(osp.join(args.out_dir, 'img_dir', split), exist_ok=True)
        if split != 'test':
            os.makedirs(osp.join(args.out_dir, 'ann_dir', split),
                        exist_ok=True)
        print(f'{split}: tiling {len(images)} images')
        for path in images:
            stem = osp.basename(path).split('.')[0]
            img = cv2.imread(path)
            for y, x, t in tile(img, patch, overlap, pad_val=0):
                cv2.imwrite(osp.join(args.out_dir, 'img_dir', split,
                                     f'{stem}_{y}_{x}.png'), t)
            if split == 'test':
                continue
            lab_path = path.replace('.png', '_instance_color_RGB.png')
            if not osp.exists(lab_path):
                lab_path = osp.join(osp.dirname(path), '..',
                                    'Semantic_masks', 'images',
                                    stem + '_instance_color_RGB.png')
            lab = color_to_label(cv2.imread(lab_path)[..., ::-1])
            for y, x, t in tile(lab, patch, overlap, pad_val=255):
                cv2.imwrite(
                    osp.join(args.out_dir, 'ann_dir', split,
                             f'{stem}_{y}_{x}_instance_color_RGB.png'), t)
    print('done')


if __name__ == '__main__':
    main()
