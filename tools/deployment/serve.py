#!/usr/bin/env python
"""Minimal HTTP serving harness.

Reference analogue: ``tools/torchserve/{mmseg2torchserve,mmseg_handler}.py``.
Loads either a config+checkpoint or an AOT artifact from export_model.py and
answers POST /predictions with a PNG class map for a posted image.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import io
from http.server import BaseHTTPRequestHandler, HTTPServer


def main():
    p = argparse.ArgumentParser(description='simple segmentation server')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--port', type=int, default=8080)
    args = p.parse_args()

    import cv2
    import numpy as np
    from lednet_tpu.apis import inference_model, init_model

    runner = init_model(args.config, args.checkpoint)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get('Content-Length', 0))
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self.send_response(400)
                self.end_headers()
                return
            result = inference_model(runner, img)
            ok, buf = cv2.imencode('.png',
                                   result['pred_sem_seg'].astype(np.uint8))
            self.send_response(200)
            self.send_header('Content-Type', 'image/png')
            self.end_headers()
            self.wfile.write(buf.tobytes())

        def log_message(self, *a):
            pass

    server = HTTPServer(('0.0.0.0', args.port), Handler)
    print(f'serving on :{args.port}')
    server.serve_forever()


if __name__ == '__main__':
    main()
