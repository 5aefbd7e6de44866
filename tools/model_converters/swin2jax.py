#!/usr/bin/env python
"""Convert an official swin checkpoint to the mmseg-style intermediate
.pth (reference ``tools/model_converters/swin2mmseg.py``); chain with
mmseg2jax.py to produce orbax params for this framework."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from official_remap import convert_swin, load_official_state_dict, save_mmseg_pth


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src', help='official checkpoint path')
    p.add_argument('dst', help='output .pth path')
    args = p.parse_args()
    save_mmseg_pth(convert_swin(load_official_state_dict(args.src)), args.dst)


if __name__ == '__main__':
    main()
