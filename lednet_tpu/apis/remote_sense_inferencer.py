"""Remote-sensing sliding-window inferencer.

Behavioral spec: reference ``mmseg/apis/remote_sense_inferencer.py`` —
arbitrarily large imagery is processed as an overlapping window grid with a
read -> inference -> write thread pipeline. TPU-native twist: windows are
grouped into fixed-size batches so every device step is one batched forward
(static shapes, no per-window dispatch), and the host-side stitch runs in a
writer thread overlapped with compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Optional, Tuple

import numpy as np

from lednet_tpu.registry import INFERENCERS


@INFERENCERS.register_module()
class RSInferencer:
    def __init__(self, runner, batch_size: int = 8, thread: int = 1):
        self.runner = runner
        self.batch_size = batch_size

    @classmethod
    def from_config_path(cls, config_path: str, checkpoint_path: str,
                        batch_size: int = 8, thread: int = 1, device=None):
        from lednet_tpu.apis.inference import init_model
        return cls(init_model(config_path, checkpoint_path),
                   batch_size=batch_size, thread=thread)

    def run(self, image: np.ndarray, window_size: Tuple[int, int],
            strides: Tuple[int, int],
            output_path: Optional[str] = None) -> np.ndarray:
        """image: HWC uint8 (BGR); returns the stitched class map."""
        import jax
        import jax.numpy as jnp
        from lednet_tpu.engine.state import make_eval_step

        H, W = image.shape[:2]
        wh, ww = window_size
        sh, sw = strides
        grid = []
        for y in range(0, max(H - wh, 0) + 1, sh):
            for x in range(0, max(W - ww, 0) + 1, sw):
                grid.append((min(y, max(H - wh, 0)), min(x, max(W - ww, 0))))
        if not grid:
            grid = [(0, 0)]

        eval_step = make_eval_step(self.runner.model, self.runner.preprocessor,
                                   mode='whole')
        num_classes = None
        votes = None
        counts = np.zeros((H, W, 1), np.float32)

        out_q: queue.Queue = queue.Queue()
        done = object()

        def writer():
            nonlocal votes
            while True:
                item = out_q.get()
                if item is done:
                    return
                origins, probs = item
                for (y, x), p in zip(origins, probs):
                    votes[y:y + wh, x:x + ww] += p
                    counts[y:y + wh, x:x + ww] += 1

        wt = None
        for i in range(0, len(grid), self.batch_size):
            chunk = grid[i:i + self.batch_size]
            batch = np.stack([image[y:y + wh, x:x + ww] for y, x in chunk])
            if len(chunk) < self.batch_size:  # pad to static batch
                pad = self.batch_size - len(chunk)
                batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
            logits = eval_step(self.runner.state, jnp.asarray(batch))
            probs = np.asarray(jax.nn.softmax(logits, axis=-1))[:len(chunk)]
            if votes is None:
                num_classes = probs.shape[-1]
                votes = np.zeros((H, W, num_classes), np.float32)
                wt = threading.Thread(target=writer, daemon=True)
                wt.start()
            out_q.put((chunk, probs[:, :wh, :ww]))
        out_q.put(done)
        if wt is not None:
            wt.join()
        seg = np.argmax(votes / np.maximum(counts, 1), axis=-1).astype(np.uint8)
        if output_path:
            import cv2
            cv2.imwrite(output_path, seg)
        return seg
