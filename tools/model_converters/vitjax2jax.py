#!/usr/bin/env python
"""Convert a google/vision_transformer JAX .npz ViT into the mmseg-style
intermediate .pth (reference ``tools/model_converters/vitjax2mmseg.py``);
chain with mmseg2jax.py to produce this framework's orbax params."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

from official_remap import convert_vitjax, save_mmseg_pth


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src', help='.npz from google/vision_transformer')
    p.add_argument('dst')
    p.add_argument('--num-layers', type=int, default=None)
    args = p.parse_args()
    npz = np.load(args.src)
    weights = {k: npz[k] for k in npz.files}
    n = args.num_layers or (24 if 'L_16-i21k' in args.src else 12)
    save_mmseg_pth(convert_vitjax(weights, n), args.dst)


if __name__ == '__main__':
    main()
