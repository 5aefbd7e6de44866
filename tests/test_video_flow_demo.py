"""Flow-propagated video demo: warp_seg semantics + CLI smoke run on a
synthetic clip (new capability; the reference's video_demo.py re-runs
inference per frame)."""
import pytest
import os.path as osp
import subprocess
import sys

import numpy as np

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

ROOT = osp.abspath(osp.join(osp.dirname(__file__), '..'))
sys.path.insert(0, osp.join(ROOT, 'demo'))


def test_warp_seg_identity_and_shift():
    from video_flow_demo import warp_seg
    seg = np.zeros((16, 16), np.uint8)
    seg[:, 8:] = 1
    flow = np.zeros((16, 16, 2), np.float32)
    np.testing.assert_array_equal(warp_seg(seg, flow), seg)
    # everything moved 2px right: the boundary shifts right by 2
    flow[..., 0] = 2.0
    warped = warp_seg(seg, flow)
    assert warped[0, 9] == 0 and warped[0, 11] == 1


def test_video_flow_demo_cli(tmp_path):
    import cv2
    video = tmp_path / 'in.avi'
    wr = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*'MJPG'), 5,
                         (96, 96))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 80, (96, 96, 3), np.uint8)
    for t in range(8):
        frame = np.roll(base, t, axis=1).copy()
        frame[:, 40:48] = 220
        wr.write(frame)
    wr.release()

    cfg = tmp_path / 'cfg.py'
    cfg.write_text(
        "model = dict(type='EncoderDecoder',"
        " backbone=dict(type='LEDNet', channels=8, ppm_channels=32),"
        " decode_head=dict(type='LEDHead', in_channels=32, channels=16,"
        " dropout_ratio=0.0, num_classes=2),"
        " test_cfg=dict(mode='whole'))\n"
        "test_pipeline = [dict(type='LoadImageFromFile'),"
        " dict(type='PackSegInputs')]\n"
        "test_dataloader = dict(dataset=dict(type='PascalVOCDataset',"
        " pipeline=test_pipeline))\n")
    out = tmp_path / 'out.avi'
    env = dict(JAX_PLATFORMS='cpu', PATH=osp.dirname(sys.executable),
               HOME='/root')
    res = subprocess.run(
        [sys.executable, osp.join(ROOT, 'demo', 'video_flow_demo.py'),
         str(video), str(cfg), '--keyframe-interval', '4',
         '--output-file', str(out)],
        capture_output=True, text=True, timeout=600, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    cap = cv2.VideoCapture(str(out))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 8
