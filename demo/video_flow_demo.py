#!/usr/bin/env python
"""Flow-propagated streaming video segmentation.

New capability beyond the reference's per-frame ``demo/video_demo.py``
(referenced behavior: capture loop -> inference -> blend -> show/write):
run full inference only every ``--keyframe-interval`` frames and propagate
the segmentation to the frames in between by warping it with dense optical
flow (Farneback), cutting per-frame cost to one flow field + one remap.
A fast scene-change guard (mean abs flow above ``--flow-reset``) forces an
early keyframe so propagation never drifts across cuts.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from argparse import ArgumentParser

import cv2
import numpy as np


def warp_seg(seg: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Warp a label map backward along the frame(t-1)->frame(t) flow."""
    h, w = seg.shape
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    # backward warp: sample t-1 labels at the positions flow points from
    map_x = gx - flow[..., 0]
    map_y = gy - flow[..., 1]
    return cv2.remap(seg.astype(np.uint8), map_x, map_y,
                     interpolation=cv2.INTER_NEAREST,
                     borderMode=cv2.BORDER_REPLICATE)


def main():
    parser = ArgumentParser()
    parser.add_argument('video', help='video file or webcam id')
    parser.add_argument('config', help='config file')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--keyframe-interval', type=int, default=5,
                        help='full inference every N frames (1 = every '
                             'frame, i.e. the plain video_demo behavior)')
    parser.add_argument('--flow-reset', type=float, default=8.0,
                        help='mean |flow| (px) that forces an early keyframe')
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--show-wait-time', default=1, type=int)
    parser.add_argument('--output-file', default=None, type=str)
    parser.add_argument('--output-fourcc', default='MJPG', type=str)
    parser.add_argument('--opacity', type=float, default=0.5)
    args = parser.parse_args()

    from lednet_tpu.apis import inference_model, init_model, show_result_pyplot

    model = init_model(args.config, args.checkpoint)

    source = int(args.video) if args.video.isdigit() else args.video
    cap = cv2.VideoCapture(source)
    assert cap.isOpened(), f'cannot open {args.video}'
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    writer = None
    if args.output_file is not None:
        fourcc = cv2.VideoWriter_fourcc(*args.output_fourcc)
        writer = cv2.VideoWriter(args.output_file, fourcc, fps, (w, h))

    prev_gray = None
    seg = None
    since_key = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            # keyframe every `interval` frames (interval=1 -> every frame,
            # i.e. plain video_demo behavior); flow is only computed when a
            # propagated frame is actually possible
            need_key = seg is None or since_key + 1 >= args.keyframe_interval
            flow = None
            if not need_key:
                flow = cv2.calcOpticalFlowFarneback(
                    prev_gray, gray, None, pyr_scale=0.5, levels=3,
                    winsize=15, iterations=3, poly_n=5, poly_sigma=1.2,
                    flags=0)
                if float(np.abs(flow).mean()) > args.flow_reset:
                    need_key = True  # scene cut: do not propagate across it
            if need_key:
                result = inference_model(model, frame)
                seg = np.asarray(result['pred_sem_seg'], np.uint8)
                since_key = 0
                drawn = show_result_pyplot(model, frame, result,
                                           opacity=args.opacity)
            else:
                seg = warp_seg(seg, flow)
                since_key += 1
                drawn = show_result_pyplot(
                    model, frame, {'pred_sem_seg': seg},
                    opacity=args.opacity)
            prev_gray = gray
            if args.show:
                cv2.imshow('video_flow_demo', drawn)
                cv2.waitKey(args.show_wait_time)
            if writer is not None:
                if drawn.shape[:2] != (h, w):
                    drawn = cv2.resize(drawn, (w, h))
                writer.write(drawn)
    finally:
        if writer is not None:
            writer.release()
        cap.release()


if __name__ == '__main__':
    main()
