"""Checkpoint save/load/resume via orbax.

Replaces the reference's mmengine ``CheckpointHook`` ``iter_N.pth`` pickles
(``configs/_base_/schedules/schedule_80k.py:23``; SURVEY.md §5.4): each
checkpoint stores the full TrainState (params, batch_stats, opt_state, step)
plus a JSON meta block (iter count + dataset classes/palette, which the
inference APIs recover exactly like ``apis/inference.py:61-70`` does).
"""
from __future__ import annotations

import json
import os
import os.path as osp
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from lednet_tpu.engine.state import TrainState


def save_checkpoint(work_dir: str, state: TrainState,
                    meta: Optional[Dict] = None) -> str:
    step = int(jax.device_get(state.step))
    path = osp.abspath(osp.join(work_dir, f'iter_{step}'))
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(path, jax.device_get(flatten_state(state)), force=True)
    ckpter.wait_until_finished()
    with open(osp.join(path, 'meta.json'), 'w', encoding='utf-8') as f:
        json.dump(dict(meta or {}, iter=step), f)
    with open(osp.join(work_dir, 'last_checkpoint'), 'w', encoding='utf-8') as f:
        f.write(path)
    return path


def flatten_state(state: TrainState) -> Dict[str, Any]:
    return dict(step=state.step, params=state.params,
                batch_stats=state.batch_stats, opt_state=state.opt_state)


def load_checkpoint(path: str, template: TrainState) -> Tuple[TrainState, Dict]:
    """Restore a TrainState saved by ``save_checkpoint``; ``template``
    supplies the pytree structure/shapes."""
    path = osp.abspath(path)
    ckpter = ocp.StandardCheckpointer()
    restored = ckpter.restore(path, flatten_state(jax.device_get(template)))
    meta = {}
    meta_path = osp.join(path, 'meta.json')
    if osp.exists(meta_path):
        with open(meta_path, encoding='utf-8') as f:
            meta = json.load(f)
    state = TrainState(step=restored['step'], params=restored['params'],
                       batch_stats=restored['batch_stats'],
                       opt_state=restored['opt_state'])
    return state, meta


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    """Reference --resume auto-latest behavior (``tools/train.py:25-28``)."""
    marker = osp.join(work_dir, 'last_checkpoint')
    if osp.exists(marker):
        with open(marker, encoding='utf-8') as f:
            path = f.read().strip()
        if osp.isdir(path):
            return path
    if not osp.isdir(work_dir):
        return None
    candidates = []
    for name in os.listdir(work_dir):
        m = re.fullmatch(r'iter_(\d+)', name)
        if m and osp.isdir(osp.join(work_dir, name)):
            candidates.append((int(m.group(1)), osp.join(work_dir, name)))
    return max(candidates)[1] if candidates else None
