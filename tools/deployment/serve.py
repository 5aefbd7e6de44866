#!/usr/bin/env python
"""HTTP serving harness with dynamic batching.

Reference analogue: ``tools/torchserve/{mmseg2torchserve,mmseg_handler}.py``
(single-request handler). TPU-native redesign: requests are coalesced into
fixed-shape batches (pad-to-B, one XLA compile) by a worker thread — batch
occupancy rides load, latency is bounded by ``--max-delay-ms``. Endpoints:

- ``POST /predictions``: image bytes -> PNG class map (resized to input).
- ``GET /healthz``: JSON serving stats (requests, batches, occupancy).
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class Batcher:
    """Coalesce single-image requests into fixed-shape model batches.

    Static (B, H, W, 3) input keeps one compiled executable; short batches
    are padded with zeros and the padding lanes' outputs dropped.
    """

    def __init__(self, runner, batch_size: int, size, max_delay_ms: float):
        import jax.numpy as jnp
        import numpy as np
        from lednet_tpu.engine.state import make_eval_step

        self.runner = runner
        self.batch_size = batch_size
        self.size = size  # (h, w)
        self.max_delay = max_delay_ms / 1000.0
        self._eval_step = make_eval_step(runner.model, runner.preprocessor,
                                         mode=runner.test_mode)
        self._queue: queue.Queue = queue.Queue()
        self.stats = dict(requests=0, batches=0, occupancy_sum=0)
        self._jnp, self._np = jnp, np
        thread = threading.Thread(target=self._loop, daemon=True)
        thread.start()

    def warmup(self):
        import numpy as np
        self._run_batch([np.zeros((*self.size, 3), np.uint8)])
        self.stats = dict(requests=0, batches=0, occupancy_sum=0)

    def submit(self, img) -> 'np.ndarray':
        """Blocking: enqueue one BGR uint8 image, wait for its class map."""
        done = threading.Event()
        slot = {}
        self._queue.put((img, done, slot))
        done.wait()
        if 'error' in slot:
            raise RuntimeError(slot['error'])
        return slot['pred']

    def _loop(self):
        while True:
            img, done, slot = self._queue.get()
            items = [(img, done, slot)]
            deadline = time.monotonic() + self.max_delay
            while len(items) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                preds = self._run_batch([it[0] for it in items])
                for (img_, done_, slot_), pred in zip(items, preds):
                    slot_['pred'] = pred
                    done_.set()
            except Exception as e:  # surface errors to every waiter
                for _, done_, slot_ in items:
                    slot_['error'] = repr(e)
                    done_.set()

    def _run_batch(self, imgs):
        import cv2
        np, jnp = self._np, self._jnp
        h, w = self.size
        ori_shapes = [im.shape[:2] for im in imgs]
        batch = np.zeros((self.batch_size, h, w, 3), np.float32)
        for i, im in enumerate(imgs):
            batch[i] = cv2.resize(im, (w, h),
                                  interpolation=cv2.INTER_LINEAR)
        logits = self._eval_step(self.runner.state, jnp.asarray(batch))
        pred = np.asarray(jnp.argmax(logits, -1), np.uint8)
        self.stats['requests'] += len(imgs)
        self.stats['batches'] += 1
        self.stats['occupancy_sum'] += len(imgs)
        return [cv2.resize(pred[i], (oh_ow[1], oh_ow[0]),
                           interpolation=cv2.INTER_NEAREST)
                for i, oh_ow in enumerate(ori_shapes)]


def main():
    p = argparse.ArgumentParser(description='batched segmentation server')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--batch-size', type=int, default=8,
                   help='static batch dimension (one XLA compile)')
    p.add_argument('--max-delay-ms', type=float, default=10.0,
                   help='max time to wait filling a batch')
    p.add_argument('--size', default='512x512',
                   help='static input HxW, e.g. 512x1024')
    args = p.parse_args()
    size = tuple(int(v) for v in args.size.lower().split('x'))
    assert len(size) == 2, '--size must be HxW'

    import cv2
    import numpy as np
    from lednet_tpu.apis import init_model

    runner = init_model(args.config, args.checkpoint)
    batcher = Batcher(runner, args.batch_size, size, args.max_delay_ms)
    print('compiling...', flush=True)
    batcher.warmup()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != '/healthz':
                self.send_response(404)
                self.end_headers()
                return
            s = batcher.stats
            body = json.dumps(dict(
                status='ok', requests=s['requests'], batches=s['batches'],
                mean_occupancy=round(s['occupancy_sum'] / max(s['batches'], 1),
                                     2),
                batch_size=batcher.batch_size)).encode()
            self.send_response(200)
            self.send_header('Content-Type', 'application/json')
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path not in ('/predictions', '/'):
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get('Content-Length', 0))
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self.send_response(400)
                self.send_header('Content-Type', 'application/json')
                self.end_headers()
                self.wfile.write(b'{"error": "not a decodable image"}')
                return
            try:
                pred = batcher.submit(img)
            except RuntimeError as e:
                self.send_response(500)
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            ok, buf = cv2.imencode('.png', pred)
            self.send_response(200)
            self.send_header('Content-Type', 'image/png')
            self.end_headers()
            self.wfile.write(buf.tobytes())

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(('0.0.0.0', args.port), Handler)
    print(f'serving on :{args.port} '
          f'(batch={args.batch_size}, delay={args.max_delay_ms}ms, '
          f'size={size[0]}x{size[1]})', flush=True)
    server.serve_forever()


if __name__ == '__main__':
    main()
