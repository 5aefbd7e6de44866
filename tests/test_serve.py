"""Serving frontend smoke test: boot tools/deployment/serve.py as a
subprocess (CPU), hit /healthz and POST /predictions, check the returned
mask PNG. Covers the torchserve-handler analogue end-to-end."""
import pytest
import os
import os.path as osp
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

ROOT = osp.abspath(osp.join(osp.dirname(__file__), '..'))


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_serve_roundtrip(tmp_path):
    import cv2
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
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # log to a file, not a pipe: an undrained pipe blocks the server once
    # its startup logging exceeds the OS buffer
    log_path = tmp_path / 'serve.log'
    log = open(log_path, 'w')
    proc = subprocess.Popen(
        [sys.executable, osp.join(ROOT, 'tools', 'deployment', 'serve.py'),
         str(cfg), '--port', str(port), '--batch-size', '2',
         '--size', '64x64', '--max-delay-ms', '5'],
        stdout=log, stderr=subprocess.STDOUT, text=True, env=env)
    try:
        deadline = time.time() + 420
        health = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f'server died:\n{log_path.read_text()[-2000:]}')
            try:
                with urllib.request.urlopen(
                        f'http://127.0.0.1:{port}/healthz', timeout=2) as r:
                    health = r.read()
                    break
            except Exception:
                time.sleep(2)
        assert health is not None, 'server never became healthy'
        assert b'"status": "ok"' in health

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        ok, buf = cv2.imencode('.png', img)
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predictions', data=buf.tobytes(),
            headers={'Content-Type': 'application/octet-stream'})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            body = r.read()
        pred = cv2.imdecode(np.frombuffer(body, np.uint8),
                            cv2.IMREAD_UNCHANGED)
        assert pred is not None and pred.shape[:2] == (64, 64)
        assert set(np.unique(pred)) <= {0, 1}
    finally:
        proc.kill()
        proc.wait()
        log.close()
