#!/usr/bin/env python
"""Single-image inference through MMSegInferencer.

Reference analogue: ``demo/image_demo_with_inferencer.py``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument('img', help='Image file')
    parser.add_argument('model', help='Config file')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--out-dir', default='', help='result directory')
    parser.add_argument('--show', action='store_true', default=False)
    parser.add_argument('--dataset-name', default='cityscapes')
    parser.add_argument('--device', default=None, help='ignored (jax picks)')
    parser.add_argument('--opacity', type=float, default=0.5)
    parser.add_argument('--with-labels', action='store_true', default=False)
    args = parser.parse_args()

    from lednet_tpu.apis import MMSegInferencer
    inferencer = MMSegInferencer(args.model, args.checkpoint,
                                 dataset_name=args.dataset_name)
    inferencer(args.img, show=args.show, out_dir=args.out_dir,
               opacity=args.opacity, with_labels=args.with_labels)


if __name__ == '__main__':
    main()
