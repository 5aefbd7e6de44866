#!/usr/bin/env python
"""Convert an author-official STDC checkpoint to the mmseg-style intermediate
.pth (reference ``tools/model_converters/stdc2mmseg.py``); chain with
mmseg2jax.py to produce orbax params for this framework."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from official_remap import convert_stdc, load_official_state_dict, save_mmseg_pth


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('type', choices=['STDC1', 'STDC2'])
    args = p.parse_args()
    save_mmseg_pth(convert_stdc(load_official_state_dict(args.src), args.type),
                   args.dst)


if __name__ == '__main__':
    main()
