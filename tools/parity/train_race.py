"""The torch-vs-jax training race: outcome-level accuracy parity.

Trains the SAME DDRNet-slim model from the SAME transplanted init on the
SAME synthetic 4-class dataset (texture + scale variation) under the full
reference recipe — SGD(0.01, 0.9, 5e-4) + PolyLR(0.9) + dual OHEM CE
(reference ``configs/_base_/schedules/schedule_80k.py:1-18``,
``tools/train.py:60-106``) — once in torch (the reference framework) and
once through lednet_tpu's jitted train step, for N seeds each, then evals
both with the same IoUMetric protocol.

Claim proven: |mIoU_jax − mIoU_torch| ≤ the cross-seed spread, i.e. the two
frameworks land at the same accuracy up to seed noise — the outcome-level
link the lockstep tests (tests/test_train_parity.py) cannot provide.

The torch mirror modules live in tests/ (they are shared transplant-parity
infrastructure); this rig adds tests/ to sys.path to reuse them.

Usage:
  python tools/parity/train_race.py --seeds 0,1,2 --iters 2500 \
      --out docs/parity_race.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, 'tests'))

LR, MOMENTUM, WD, POWER = 0.01, 0.9, 5e-4, 0.9
THRES, MIN_KEPT = 0.9, 512
NCLS, CANVAS, CROP, BS = 4, 96, 64, 4


# --------------------------------------------------------------------------
# Synthetic 4-class dataset: textured background + three object families at
# varying scale (the VERDICT's "≥4 classes with texture + scale variation").
# --------------------------------------------------------------------------

def _paint_sample(rng, size):
    """One (img f32 HxWx3, label i32 HxW) pair.

    class 0: low-frequency noise background
    class 1: diagonal bright band   (width 3-10 — scale variation)
    class 2: checkerboard rectangle (cell 2-5, side 12-40)
    class 3: radial-gradient disk   (radius 6-22)
    Objects painted in random order; later paint wins (occlusion).
    """
    ii, jj = np.meshgrid(np.arange(size), np.arange(size), indexing='ij')
    # background: low-freq blotches + pixel noise
    fy, fx = rng.uniform(0.02, 0.08, 2)
    ph = rng.uniform(0, 2 * np.pi, 2)
    base = 60 + 25 * np.sin(2 * np.pi * fy * ii + ph[0]) \
        * np.cos(2 * np.pi * fx * jj + ph[1])
    img = np.stack([base] * 3, -1) + rng.normal(0, 12, (size, size, 3))
    lab = np.zeros((size, size), np.int32)

    def band():
        c = rng.integers(-size // 3, size // 3)
        w = rng.integers(3, 11)
        slope = rng.choice([-1, 1])
        m = np.abs(ii - slope * jj - c) < w
        img[m] = rng.normal(190, 15) + rng.normal(0, 10, (m.sum(), 3))
        lab[m] = 1

    def block():
        side = rng.integers(12, 41)
        y0 = rng.integers(0, size - side)
        x0 = rng.integers(0, size - side)
        cell = rng.integers(2, 6)
        m = np.zeros((size, size), bool)
        m[y0:y0 + side, x0:x0 + side] = True
        check = ((ii // cell + jj // cell) % 2).astype(np.float64)
        tex = 70 + 80 * check + rng.normal(0, 8, (size, size))
        img[m] = np.stack([tex, tex * 0.9, tex * 1.1], -1)[m]
        lab[m] = 2

    def disk():
        r = rng.integers(6, 23)
        cy = rng.integers(r, size - r)
        cx = rng.integers(r, size - r)
        d2 = (ii - cy) ** 2 + (jj - cx) ** 2
        m = d2 < r * r
        grad = 160 - 90 * np.sqrt(np.maximum(d2, 0)) / r
        img[m] = np.stack([grad * 1.1, grad, grad * 0.8], -1)[m] \
            + rng.normal(0, 8, (m.sum(), 3))
        lab[m] = 3

    objs = [band, block, disk]
    order = rng.permutation(3)
    # 1-3 objects per image; each family present with p≈0.8
    for k in order:
        if rng.random() < 0.8:
            objs[k]()
    return img.astype(np.float32), lab


def gen_dataset(seed, n_train=160, n_val=32):
    rng = np.random.default_rng(seed * 1000 + 7)
    train = [_paint_sample(rng, CANVAS) for _ in range(n_train)]
    val = [_paint_sample(rng, CROP) for _ in range(n_val)]
    return (np.stack([t[0] for t in train]), np.stack([t[1] for t in train]),
            np.stack([v[0] for v in val]), np.stack([v[1] for v in val]))


def batch_schedule(seed, iters, n_train):
    """Precomputed sampling + matched-aug draws: both frameworks consume the
    IDENTICAL sequence of (index, flip, crop-offset) per step."""
    rng = np.random.default_rng(seed * 1000 + 13)
    return dict(
        idx=rng.integers(0, n_train, (iters, BS)),
        flip=rng.random((iters, BS)) < 0.5,
        oy=rng.integers(0, CANVAS - CROP + 1, (iters, BS)),
        ox=rng.integers(0, CANVAS - CROP + 1, (iters, BS)))


def make_batch(imgs, labs, sched, i):
    xs = np.empty((BS, CROP, CROP, 3), np.float32)
    ys = np.empty((BS, CROP, CROP), np.int32)
    for b in range(BS):
        j = sched['idx'][i, b]
        oy, ox = sched['oy'][i, b], sched['ox'][i, b]
        im = imgs[j][oy:oy + CROP, ox:ox + CROP]
        lb = labs[j][oy:oy + CROP, ox:ox + CROP]
        if sched['flip'][i, b]:
            im, lb = im[:, ::-1], lb[:, ::-1]
        xs[b], ys[b] = im, lb
    return xs, ys


# --------------------------------------------------------------------------
# The two runners
# --------------------------------------------------------------------------

def _init_params(seed):
    """Build the jax model and seed-derived init ONCE; both frameworks start
    from this transplanted state."""
    import jax
    import jax.numpy as jnp
    from lednet_tpu.registry import MODELS
    import lednet_tpu.models  # noqa: F401
    from test_ddrnet_parity import C
    from lednet_tpu.engine.optim import build_optimizer
    from lednet_tpu.engine.state import create_train_state

    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='DDRNet', channels=C, ppm_channels=2 * C),
        decode_head=dict(
            type='DDRHead', in_channels=4 * C, channels=2 * C,
            num_classes=NCLS, dropout_ratio=0.0,
            loss_decode=[
                dict(type='OhemCrossEntropy', thres=THRES,
                     min_kept=MIN_KEPT, loss_weight=1.0),
                dict(type='OhemCrossEntropy', thres=THRES,
                     min_kept=MIN_KEPT, loss_weight=0.4)])))
    return model, create_train_state(
        model,
        build_optimizer(dict(optimizer=dict(
            type='SGD', lr=LR, momentum=MOMENTUM, weight_decay=WD)), [])[0],
        dict(inputs=jnp.zeros((BS, CROP, CROP, 3)),
             gt_seg_map=jnp.zeros((BS, CROP, CROP), jnp.int32)),
        rng=jax.random.PRNGKey(seed))


def _miou(preds, labels):
    """The repo IoUMetric protocol — shared verdict device for both sides."""
    from lednet_tpu.evaluation.iou_metric import IoUMetric
    m = IoUMetric()
    for p, l in zip(preds, labels):
        m.process(p, l, num_classes=NCLS)
    res = m.compute_metrics()
    return res['mIoU'], res


def run_jax(seed, iters, data, log=print, eval_iters=(),
            return_state=False):
    """``eval_iters``: additional mid-run eval points; the returned 'miou'
    is then the MEAN over all eval points (incl. the final one) — the mIoU
    trajectory of this chaotic recipe bounces by several points between
    checkpoints (measured ±8 for torch between iters 2000 and 2500), so a
    late-checkpoint average is the stable outcome statistic."""
    import jax
    import jax.numpy as jnp
    from lednet_tpu.engine.optim import build_optimizer
    from lednet_tpu.engine.state import make_eval_step, make_train_step

    imgs, labs, vimgs, vlabs = data
    sched = batch_schedule(seed, iters, len(imgs))
    model, state = _init_params(seed)
    tx, _ = build_optimizer(
        dict(optimizer=dict(type='SGD', lr=LR, momentum=MOMENTUM,
                            weight_decay=WD)),
        [dict(type='PolyLR', power=POWER, begin=0, end=iters,
              by_epoch=False)])
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    def eval_now(state):
        logits = eval_step(state, jnp.asarray(vimgs))
        return _miou(np.asarray(jnp.argmax(logits, -1)), vlabs)

    t0 = time.time()
    mious = {}
    for i in range(iters):
        x, y = make_batch(imgs, labs, sched, i)
        state, logs = step(state, jnp.asarray(x), jnp.asarray(y))
        if (i + 1) in eval_iters:
            mious[i + 1], _ = eval_now(state)
        if (i + 1) % 500 == 0:
            log(f'  [jax seed={seed}] iter {i + 1}/{iters} '
                f'loss={float(logs["loss"]):.4f} '
                f'({time.time() - t0:.0f}s)')
    final, res = eval_now(state)
    mious[iters] = final
    out = dict(framework='jax', seed=seed, iters=iters,
               miou=round(float(np.mean(list(mious.values()))), 2),
               miou_by_iter=mious, metrics=res,
               train_s=round(time.time() - t0, 1))
    if return_state:
        out['state'] = state    # for cross-framework weight evaluation
    return out


def run_torch(seed, iters, data, log=print, perturb=0.0, perturb_seed=1,
              grad_noise=0.0, eval_iters=()):
    """``perturb`` adds N(0, perturb) noise to the transplanted init;
    ``grad_noise`` multiplies every gradient by (1 + N(0, grad_noise)) each
    step (models accumulated per-step fp divergence between frameworks).
    ``eval_iters``: see ``run_jax`` — 'miou' becomes the mean over eval
    points."""
    import torch
    import torch.nn.functional as F
    from test_ddrnet_parity import TDDRNet, C
    from test_train_parity import (THead, TorchOhem, _copy_backbone,
                                   _copy_head)
    import jax

    torch.set_num_threads(max(1, os.cpu_count()))
    imgs, labs, vimgs, vlabs = data
    sched = batch_schedule(seed, iters, len(imgs))
    _, state = _init_params(seed)
    p0 = jax.device_get(state.params)
    s0 = jax.device_get(state.batch_stats)
    del state

    tb, th = TDDRNet(), THead(cin=4 * C, ch=2 * C, ncls=NCLS)
    _copy_backbone(tb, p0['_backbone'], s0['_backbone'])
    _copy_head(th, p0['_decode_head'], s0['_decode_head'])
    if perturb:
        gen = torch.Generator().manual_seed(perturb_seed)
        with torch.no_grad():
            for p in list(tb.parameters()) + list(th.parameters()):
                p.add_(perturb * torch.randn(p.shape, generator=gen))
    tb.train(), th.train()
    opt = torch.optim.SGD(list(tb.parameters()) + list(th.parameters()),
                          lr=LR, momentum=MOMENTUM, weight_decay=WD)
    ohem_ctx = TorchOhem(THRES, MIN_KEPT, 1.0)
    ohem_spa = TorchOhem(THRES, MIN_KEPT, 0.4)
    t0 = time.time()
    mious = {}
    for i in range(iters):
        for g in opt.param_groups:
            g['lr'] = LR * (1.0 - i / iters) ** POWER
        xs, ys = make_batch(imgs, labs, sched, i)
        x = torch.from_numpy(xs.transpose(0, 3, 1, 2).copy())
        y = torch.from_numpy(ys.astype(np.int64))
        temp, final = tb(x)
        xc, xsp = th(temp, final)
        xc = F.interpolate(xc, (CROP, CROP), mode='bilinear',
                           align_corners=False)
        xsp = F.interpolate(xsp, (CROP, CROP), mode='bilinear',
                            align_corners=False)
        loss = ohem_ctx(xc, y) + ohem_spa(xsp, y)
        opt.zero_grad()
        loss.backward()
        if grad_noise:
            gen = getattr(opt, '_noise_gen', None)
            if gen is None:
                gen = opt._noise_gen = torch.Generator().manual_seed(
                    perturb_seed)
            with torch.no_grad():
                for p in list(tb.parameters()) + list(th.parameters()):
                    if p.grad is not None:
                        p.grad.mul_(1 + grad_noise * torch.randn(
                            p.grad.shape, generator=gen))
        opt.step()
        if (i + 1) in eval_iters:
            mious[i + 1], _ = _torch_eval(tb, th, vimgs, vlabs)
            tb.train(), th.train()
        if (i + 1) % 500 == 0:
            log(f'  [torch seed={seed}] iter {i + 1}/{iters} '
                f'loss={float(loss.detach()):.4f} '
                f'({time.time() - t0:.0f}s)')
    final, res = _torch_eval(tb, th, vimgs, vlabs)
    mious[iters] = final
    return dict(framework='torch', seed=seed, iters=iters,
                miou=round(float(np.mean(list(mious.values()))), 2),
                miou_by_iter=mious, metrics=res,
                train_s=round(time.time() - t0, 1))


def _torch_eval(tb, th, vimgs, vlabs):
    import torch
    import torch.nn.functional as F
    tb.eval(), th.eval()
    preds = []
    with torch.no_grad():
        for v in vimgs:
            x = torch.from_numpy(v.transpose(2, 0, 1)[None].copy())
            temp, final = tb(x)
            xc, _ = th(temp, final)
            xc = F.interpolate(xc, (CROP, CROP), mode='bilinear',
                               align_corners=False)
            preds.append(xc.argmax(1)[0].numpy())
    return _miou(np.stack(preds), vlabs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', default='0,1,2')
    ap.add_argument('--iters', type=int, default=2500)
    ap.add_argument('--frameworks', default='torch,jax')
    ap.add_argument('--out', default='docs/parity_race.json')
    args = ap.parse_args()

    # jax on CPU: fair single-host comparison, leaves the TPU free
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import lednet_tpu
    lednet_tpu.register_all_modules()

    seeds = [int(s) for s in args.seeds.split(',')]
    # late-checkpoint averaging: the mIoU trajectory bounces by several
    # points between adjacent checkpoints (chaotic recipe), so the outcome
    # statistic is the mean over the last ~5 checkpoints, not one endpoint
    eval_iters = tuple(range(args.iters - 400, args.iters, 100))
    results = []
    for seed in seeds:
        data = gen_dataset(seed)
        for fw in args.frameworks.split(','):
            run = run_jax if fw == 'jax' else run_torch
            r = run(seed, args.iters, data, eval_iters=eval_iters)
            print(f'{fw} seed={seed}: mIoU={r["miou"]:.2f} '
                  f'({r["train_s"]}s)', flush=True)
            results.append(r)
            with open(args.out, 'w') as f:
                json.dump(dict(results=results, config=vars(args)), f,
                          indent=1)

    tor = [r['miou'] for r in results if r['framework'] == 'torch']
    jx = [r['miou'] for r in results if r['framework'] == 'jax']
    if tor and jx:
        spread = max(max(tor) - min(tor), max(jx) - min(jx))
        gap = abs(np.mean(tor) - np.mean(jx))
        summary = dict(torch_mious=tor, jax_mious=jx,
                       torch_mean=round(float(np.mean(tor)), 2),
                       jax_mean=round(float(np.mean(jx)), 2),
                       cross_seed_spread=round(float(spread), 2),
                       mean_gap=round(float(gap), 2),
                       parity=bool(gap <= max(spread, 1.0)))
        print(json.dumps(summary), flush=True)
        with open(args.out, 'w') as f:
            json.dump(dict(results=results, summary=summary,
                           config=vars(args)), f, indent=1)


if __name__ == '__main__':
    main()
