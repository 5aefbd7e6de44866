#!/usr/bin/env python
"""Convert an official Twins (PCPVT/SVT) checkpoint to the mmseg-style
intermediate .pth (reference ``tools/model_converters/twins2mmseg.py``);
chain with mmseg2jax.py to produce orbax params for this framework."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from official_remap import convert_twins, load_official_state_dict, save_mmseg_pth


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('model', choices=['pcpvt', 'svt'])
    args = p.parse_args()
    save_mmseg_pth(convert_twins(load_official_state_dict(args.src), args.model),
                   args.dst)


if __name__ == '__main__':
    main()
