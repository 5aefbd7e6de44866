#!/usr/bin/env python
"""Single-image inference demo (CLI mirrors the reference
``demo/image_demo.py``: img, config, checkpoint, --out-file, --opacity)."""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument('img', help='image file')
    parser.add_argument('config', help='config file')
    parser.add_argument('checkpoint', nargs='?', default=None,
                        help='checkpoint dir (optional)')
    parser.add_argument('--out-file', default=None, help='path to save result')
    parser.add_argument('--device', default=None, help='ignored (jax devices)')
    parser.add_argument('--opacity', type=float, default=0.5)
    parser.add_argument('--title', default='result')
    parser.add_argument('--with-labels', action='store_true', default=True)
    args = parser.parse_args()

    from lednet_tpu.apis import inference_model, init_model, show_result_pyplot

    model = init_model(args.config, args.checkpoint)
    result = inference_model(model, args.img)
    show_result_pyplot(model, args.img, result, opacity=args.opacity,
                       out_file=args.out_file, title=args.title)
    if args.out_file:
        print(f'saved to {args.out_file}')


if __name__ == '__main__':
    main()
