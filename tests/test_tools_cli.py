"""Smoke tests for the analysis/misc tool CLIs (subprocess, CPU)."""
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..'))
ENV = dict(os.environ, JAX_PLATFORMS='cpu')


def run_tool(args, timeout=240):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, env=ENV, cwd=REPO)


def test_print_config():
    out = run_tool(['tools/misc/print_config.py',
                    'configs/LED_Net/lednet_80k_branch-512x1024.py'])
    assert out.returncode == 0, out.stderr[-1500:]
    assert "'type': 'LEDNet'" in out.stdout
    assert "'min_kept': 131072" in out.stdout


def test_analyze_logs(tmp_path):
    log = tmp_path / 'scalars.json'
    with open(log, 'w') as f:
        for i in range(5):
            f.write(json.dumps({'step': i, 'loss': 1.0 / (i + 1),
                                'time': 0.1}) + '\n')
    out_png = tmp_path / 'curve.png'
    out = run_tool(['tools/analysis_tools/analyze_logs.py', 'plot_curve',
                    str(log), '--keys', 'loss', '--out', str(out_png)])
    assert out.returncode == 0, out.stderr[-1500:]
    assert out_png.exists()
    out = run_tool(['tools/analysis_tools/analyze_logs.py', 'cal_train_time',
                    str(log)])
    assert out.returncode == 0 and 'mean 0.1' in out.stdout


def test_browse_dataset(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    (tmp_path / 'JPEGImages').mkdir()
    (tmp_path / 'SegmentationClassPNG').mkdir()
    for i in range(2):
        cv2.imwrite(str(tmp_path / f'JPEGImages/im{i}.png'),
                    rng.integers(0, 255, (32, 32, 3), np.uint8))
        cv2.imwrite(str(tmp_path / f'SegmentationClassPNG/im{i}.png'),
                    rng.integers(0, 2, (32, 32), np.uint8))
    (tmp_path / 'train.txt').write_text('im0\nim1')
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(f"""
train_dataloader = dict(
    dataset=dict(type='PascalVOCDataset', data_root='{tmp_path}',
                 ann_file='train.txt',
                 data_prefix=dict(img_path='JPEGImages',
                                  seg_map_path='SegmentationClassPNG'),
                 pipeline=[dict(type='LoadImageFromFile'),
                           dict(type='LoadAnnotations'),
                           dict(type='PackSegInputs')]))
""")
    out_dir = tmp_path / 'browse'
    out = run_tool(['tools/misc/browse_dataset.py', str(cfg),
                    '--output-dir', str(out_dir), '--num-samples', '2'])
    assert out.returncode == 0, out.stderr[-1500:]
    assert (out_dir / 'sample_0.png').exists()


@pytest.mark.slow
def test_get_flops():
    out = run_tool(['tools/analysis_tools/get_flops.py',
                    'configs/LED_Net/lednet_80k_branch-512x1024.py',
                    '--shape', '128', '128'])
    assert out.returncode == 0, out.stderr[-1500:]
    assert 'Params:' in out.stdout
    # both counting conventions printed, MAC = XLA/2
    import re
    xla = float(re.search(r'1 MAC = 2 flops\): ([\d.]+) G', out.stdout).group(1))
    mac = float(re.search(r'MAC convention\): ([\d.]+) G', out.stdout).group(1))
    assert abs(mac - xla / 2) < 0.01 and xla > 0
