#!/usr/bin/env python
"""bf16 AMP vs f32 train step at a scale where AMP should matter.

Round-2 VERDICT weak #3 / next #10: at LED-Net scale the bf16 step roughly
ties f32 (the model is launch/VPU-bound), so the ``--amp`` flag had no
demonstrated value. This measures the same A/B on SegNeXt MSCAN-L at
512x512 — a heavy MXU-bound config (reference
``configs/segnext/segnext_mscan-l_...py``) — where bf16's halved matmul
cost and HBM traffic should show a real win.

Per the verify-skill A/B protocol, run each arm in its OWN process (axon
executable-degradation artifact): this script runs ONE arm and prints its
JSON; the wrapper mode (--ab) forks itself for each arm, alternating, and
reports best-of-3 per arm.

Usage (real chip):  python tools/speed/amp_at_scale.py --ab
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import subprocess
import sys
import time

import numpy as np

_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, _REPO)


def run_arm(amp: bool, bs: int, size: int, reps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.config import Config
    from lednet_tpu.engine.optim import build_optimizer
    from lednet_tpu.engine.state import create_train_state, make_train_step
    from lednet_tpu.models.data_preprocessor import SegDataPreProcessor
    from lednet_tpu.registry import MODELS

    cfg = Config.fromfile(
        osp.join(_REPO, 'configs/segnext/segnext_mscan-l_ade20k-512x512.py'))
    model_cfg = dict(cfg.model)
    model_cfg.pop('data_preprocessor', None)
    model = MODELS.build(model_cfg)
    pre = SegDataPreProcessor(mean=[123.675, 116.28, 103.53],
                              std=[58.395, 57.12, 57.375], bgr_to_rgb=True)
    tx, _ = build_optimizer(
        dict(optimizer=dict(type='AdamW', lr=6e-5, weight_decay=0.01)),
        [dict(type='PolyLR', power=1.0, begin=0, end=160000,
              by_epoch=False)])

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (bs, size, size, 3), np.uint8),
                       jnp.float32)
    labels = jnp.asarray(rng.integers(0, 150, (bs, size, size), np.int32))
    state = create_train_state(model, tx,
                               dict(inputs=imgs, gt_seg_map=labels))
    step = make_train_step(model, tx, preprocessor=pre, amp=amp)
    state, logs = step(state, imgs, labels)  # compile
    jax.block_until_ready(logs['loss'])
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, logs = step(state, imgs, labels)
        jax.block_until_ready(logs['loss'])
        dts.append(time.perf_counter() - t0)
    ms = np.array(dts) * 1e3
    return dict(amp=amp, bs=bs, size=size,
                p50_ms=round(float(np.percentile(ms, 50)), 3),
                mean_ms=round(float(ms.mean()), 3),
                img_per_s=round(bs / (float(np.percentile(ms, 50)) / 1e3), 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ab', action='store_true',
                    help='run both arms x3, one process each, report best')
    ap.add_argument('--amp', action='store_true')
    ap.add_argument('--bs', type=int, default=8)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--reps', type=int, default=30)
    ap.add_argument('--json', default=None)
    args = ap.parse_args()

    if not args.ab:
        print(json.dumps(run_arm(args.amp, args.bs, args.size, args.reps)))
        return

    results = {'f32': [], 'amp': []}
    for _ in range(3):
        for key, flag in (('f32', []), ('amp', ['--amp'])):
            out = subprocess.run(
                [sys.executable, osp.abspath(__file__), *flag,
                 '--bs', str(args.bs), '--size', str(args.size),
                 '--reps', str(args.reps)],
                cwd=_REPO, capture_output=True, text=True, timeout=1200)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith('{')]
            if not line:
                raise SystemExit(f'arm {key} failed:\n{out.stdout[-2000:]}'
                                 f'\n{out.stderr[-2000:]}')
            results[key].append(json.loads(line[-1]))
    best = {k: min(v, key=lambda r: r['p50_ms']) for k, v in results.items()}
    summary = dict(
        model='SegNeXt MSCAN-L 512x512', bs=args.bs,
        f32_p50_ms=best['f32']['p50_ms'], amp_p50_ms=best['amp']['p50_ms'],
        speedup=round(best['f32']['p50_ms'] / best['amp']['p50_ms'], 3),
        f32_img_per_s=best['f32']['img_per_s'],
        amp_img_per_s=best['amp']['img_per_s'])
    print(json.dumps(summary))
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(dict(summary=summary, runs=results), f, indent=1)


if __name__ == '__main__':
    main()
