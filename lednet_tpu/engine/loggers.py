"""Training observability: console + scalars.json (+ optional TensorBoard).

Mirrors the reference's LoggerHook(interval=50) console lines and the
``work_dir/<ts>/vis_data/scalars.json`` JSON-lines file
(``configs/_base_/default_runtime.py:11-16``; SURVEY.md §5.5). TensorBoard is
enabled when ``torch.utils.tensorboard`` is importable, matching the fork's
``TensorboardVisBackend``.
"""
from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Dict, Optional


class ScalarLogger:
    def __init__(self, work_dir: str, use_tensorboard: bool = True):
        self.vis_dir = osp.join(work_dir, 'vis_data')
        os.makedirs(self.vis_dir, exist_ok=True)
        self.scalar_path = osp.join(self.vis_dir, 'scalars.json')
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(osp.join(self.vis_dir, 'tb'))
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, float], prefix: str = '') -> None:
        record = {f'{prefix}{k}': _to_float(v) for k, v in scalars.items()}
        record['step'] = step
        with open(self.scalar_path, 'a', encoding='utf-8') as f:
            f.write(json.dumps(record) + '\n')
        if self._tb is not None:
            for k, v in record.items():
                if k != 'step':
                    self._tb.add_scalar(k, v, step)

    def console(self, step: int, max_iters: int, scalars: Dict[str, float],
                lr: Optional[float] = None, iter_time: Optional[float] = None):
        parts = [f'Iter [{step}/{max_iters}]']
        if lr is not None:
            parts.append(f'lr: {lr:.4e}')
        if iter_time is not None:
            eta = (max_iters - step) * iter_time
            parts.append(f'time: {iter_time:.3f}s')
            parts.append(f'eta: {_fmt_eta(eta)}')
        parts += [f'{k}: {_to_float(v):.4f}' for k, v in scalars.items()]
        print('  '.join(parts), flush=True)

    def close(self):
        if self._tb is not None:
            self._tb.close()


def _to_float(v) -> float:
    try:
        return float(v)
    except (TypeError, ValueError):
        return float('nan')


def _fmt_eta(seconds: float) -> str:
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    return f'{h:d}:{m:02d}:{s:02d}'
