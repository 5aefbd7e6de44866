#!/usr/bin/env python
"""Prepare the Synapse multi-organ CT dataset (per-slice PNGs).

Reference analogue ``tools/dataset_converters/synapse.py``: 3D ``img/
imgXXXX.nii.gz`` + ``label/labelXXXX.nii.gz`` volumes; case ids in
``train.txt``/``val.txt`` (entries like ``img0001.nii.gz``, id = chars
3:7); each axial slice is written as a PNG pair, with the 13-organ labels
remapped to the 8-class protocol {8->1, 4->2, 3->3, 2->4, 6->5, 11->6,
1->7, 7->8} (everything else 0). Requires nibabel (gated).
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os

import numpy as np

LABEL_MAP = {8: 1, 4: 2, 3: 3, 2: 4, 6: 5, 11: 6, 1: 7, 7: 8}


def remap_label(label: np.ndarray) -> np.ndarray:
    out = np.zeros_like(label, np.uint8)
    for raw, new in LABEL_MAP.items():
        out[label == raw] = new
    return out


def _read_ids(path: str):
    with open(path) as f:
        return [line.strip()[3:7] for line in f if line.strip()]


def main():
    p = argparse.ArgumentParser(description='Synapse CT preparation')
    p.add_argument('--dataset-path', required=True,
                   help='root with img/, label/, train.txt, val.txt')
    p.add_argument('--save-path', default='data/synapse')
    args = p.parse_args()

    try:
        import nibabel as nib
    except ImportError:
        raise SystemExit('synapse.py requires nibabel (not installed); '
                         'install it or prepare slices elsewhere')
    import cv2

    for sub in ('img_dir/train', 'img_dir/val', 'ann_dir/train',
                'ann_dir/val'):
        os.makedirs(osp.join(args.save_path, sub), exist_ok=True)
    for split in ('train', 'val'):
        ids = _read_ids(osp.join(args.dataset_path, f'{split}.txt'))
        print(f'{split}: {len(ids)} volumes')
        for idx in ids:
            img3d = np.asarray(nib.load(osp.join(
                args.dataset_path, 'img', f'img{idx}.nii.gz')).get_fdata())
            lab3d = np.asarray(nib.load(osp.join(
                args.dataset_path, 'label',
                f'label{idx}.nii.gz')).get_fdata())
            # window CT values to uint8 for PNG storage
            lo, hi = np.percentile(img3d, (0.5, 99.5))
            img3d = np.clip((img3d - lo) / max(hi - lo, 1e-6), 0, 1) * 255
            for z in range(img3d.shape[-1]):
                name = f'case{idx}_slice{z:03d}.png'
                cv2.imwrite(osp.join(args.save_path, 'img_dir', split, name),
                            img3d[..., z].astype(np.uint8))
                cv2.imwrite(osp.join(args.save_path, 'ann_dir', split, name),
                            remap_label(lab3d[..., z]))
    print('done')


if __name__ == '__main__':
    main()
