#!/usr/bin/env python
"""Remote-sensing large-image inference (windowed, threaded writer).

Reference analogue: ``demo/rs_image_inference.py``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument('image', help='Image file path')
    parser.add_argument('config', help='Config file')
    parser.add_argument('checkpoint', help='Checkpoint file')
    parser.add_argument('--output-path', default='result.png')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--window-size', type=int, nargs=2, default=(224, 224))
    parser.add_argument('--stride', type=int, nargs=2, default=(224, 224))
    parser.add_argument('--thread', type=int, default=1)
    parser.add_argument('--device', default=None, help='ignored (jax picks)')
    args = parser.parse_args()

    import cv2
    image = cv2.imread(args.image)  # validate before the expensive build
    if image is None:
        raise SystemExit(f'could not read image: {args.image}')
    from lednet_tpu.apis import RSInferencer
    inferencer = RSInferencer.from_config_path(
        args.config, args.checkpoint, batch_size=args.batch_size,
        thread=args.thread)
    inferencer.run(image, tuple(args.window_size), tuple(args.stride),
                   args.output_path)
    print(f'saved {args.output_path}')


if __name__ == '__main__':
    main()
