#!/usr/bin/env python
"""Streaming video inference demo (CLI mirrors the reference
``demo/video_demo.py``: capture loop -> per-frame inference -> blend ->
show/write)."""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from argparse import ArgumentParser

import cv2


def main():
    parser = ArgumentParser()
    parser.add_argument('video', help='video file or webcam id')
    parser.add_argument('config', help='config file')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--device', default=None)
    parser.add_argument('--palette', default=None)
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--show-wait-time', default=1, type=int)
    parser.add_argument('--output-file', default=None, type=str)
    parser.add_argument('--output-fourcc', default='MJPG', type=str)
    parser.add_argument('--output-fps', default=-1, type=int)
    parser.add_argument('--output-height', default=-1, type=int)
    parser.add_argument('--output-width', default=-1, type=int)
    parser.add_argument('--opacity', type=float, default=0.5)
    args = parser.parse_args()

    from lednet_tpu.apis import inference_model, init_model, show_result_pyplot

    model = init_model(args.config, args.checkpoint)

    source = int(args.video) if args.video.isdigit() else args.video
    cap = cv2.VideoCapture(source)
    assert cap.isOpened(), f'cannot open {args.video}'
    input_fps = cap.get(cv2.CAP_PROP_FPS)
    input_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    input_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    writer = None
    if args.output_file is not None:
        fourcc = cv2.VideoWriter_fourcc(*args.output_fourcc)
        fps = args.output_fps if args.output_fps > 0 else input_fps
        w = args.output_width if args.output_width > 0 else input_w
        h = args.output_height if args.output_height > 0 else input_h
        writer = cv2.VideoWriter(args.output_file, fourcc, fps, (w, h))

    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            result = inference_model(model, frame)
            drawn = show_result_pyplot(model, frame, result,
                                       opacity=args.opacity)
            if args.show:
                cv2.imshow('video_demo', drawn)
                cv2.waitKey(args.show_wait_time)
            if writer is not None:
                if drawn.shape[:2] != (writer.get(4), writer.get(3)):
                    drawn = cv2.resize(drawn, (input_w, input_h))
                writer.write(drawn)
    finally:
        if writer is not None:
            writer.release()
        cap.release()


if __name__ == '__main__':
    main()
