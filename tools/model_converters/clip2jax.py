#!/usr/bin/env python
"""Convert an OpenAI CLIP checkpoint into the SAN layout intermediate .pth
(reference ``tools/model_converters/clip2mmseg.py``: ViT-B/16 splits the
visual tower at resblock 9, ViT-L/14 at 18); chain with mmseg2jax.py."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from official_remap import convert_clip, load_official_state_dict, save_mmseg_pth


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('--visual-split', type=int, default=None,
                   help='override the in-tower/rec-head split index')
    args = p.parse_args()
    split = args.visual_split
    if split is None:
        if any(s in args.src for s in ('B-16', 'b16', 'base_patch16')):
            split = 9
        elif any(s in args.src for s in ('L-14', 'l14', 'large_patch14')):
            split = 18
        else:
            raise SystemExit('cannot infer CLIP variant from filename; '
                             'pass --visual-split (9 for B/16, 18 for L/14)')
    save_mmseg_pth(convert_clip(load_official_state_dict(args.src), split),
                   args.dst)


if __name__ == '__main__':
    main()
