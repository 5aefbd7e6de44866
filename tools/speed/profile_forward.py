"""Trace-backed per-op device-time profile of a jitted step (VERDICT r3 #2).

``jax.profiler`` works through the axon tunnel and records REAL per-fusion
device times on the TPU (unlike ``block_until_ready`` brackets, which this
stack acks at dispatch — see ``lednet_tpu/utils/timing.py``).  This rig:

1. jits the requested step (whole-model predict by default, or the train
   step with ``--train``), runs N profiled iterations under
   ``jax.profiler.trace``;
2. aggregates the device-side events per executable op;
3. maps each op back to the module that emitted it via the compiled HLO's
   ``op_name`` metadata (e.g. ``fusion.925`` ->
   ``_backbone/stem_conv1/conv``);
4. emits a markdown table (``--out docs/latency.md``) grouped by module
   path, with per-op and per-group device microseconds.

The whole-step device total printed here cross-checks against the
``chain_slope`` measurement in ``bench.py`` (they agree within ~4% —
trace events include per-op launch bookkeeping).

Reference analogue: the per-model speed tables of
``tools/speed/ddrnet_speed.py:416-490`` — this is the per-STAGE version,
measured instead of asserted.

Usage (real chip):
  python tools/speed/profile_forward.py --size 720x1280 --out docs/latency.md
  python tools/speed/profile_forward.py --train --size 512x512 --bs 8
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def build_predict(H, W, num_classes=2, channels=32):
    import jax
    import jax.numpy as jnp

    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.engine.state import jit_init
    from lednet_tpu.models.data_preprocessor import SegDataPreProcessor
    from lednet_tpu.registry import MODELS
    from lednet_tpu.utils.precision import cast_floating

    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', in_channels=3, channels=channels,
                      ppm_channels=4 * channels, align_corners=False),
        decode_head=dict(type='LEDHead', in_channels=4 * channels,
                         channels=2 * channels, dropout_ratio=0.0,
                         num_classes=num_classes, align_corners=False),
        test_cfg=dict(mode='whole')))
    pre = SegDataPreProcessor(mean=[123.675, 116.28, 103.53],
                              std=[58.395, 57.12, 57.375], bgr_to_rgb=True,
                              out_dtype=jnp.bfloat16, pack_s2d=True)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x0, train=False)
    params = cast_floating(variables['params'], jnp.bfloat16)
    batch_stats = variables.get('batch_stats', {})

    def predict(params, batch_stats, img):
        img, _, _ = pre(img, None, training=False)
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           img, method='predict')

    frame = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, H, W, 3)), jnp.float32)
    return jax.jit(predict), (params, batch_stats, frame)


def build_train(H, W, bs, num_classes=2, channels=32, amp=False):
    import jax
    import jax.numpy as jnp

    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.engine.optim import build_optimizer
    from lednet_tpu.engine.state import create_train_state, make_train_step
    from lednet_tpu.models.data_preprocessor import SegDataPreProcessor
    from lednet_tpu.registry import MODELS

    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', in_channels=3, channels=channels,
                      ppm_channels=4 * channels, align_corners=False),
        decode_head=dict(type='LEDHead', in_channels=4 * channels,
                         channels=2 * channels, dropout_ratio=0.0,
                         num_classes=num_classes, align_corners=False),
        test_cfg=dict(mode='whole')))
    pre = SegDataPreProcessor(mean=[123.675, 116.28, 103.53],
                              std=[58.395, 57.12, 57.375], bgr_to_rgb=True)
    tx, _ = build_optimizer(
        dict(optimizer=dict(type='SGD', lr=0.01, momentum=0.9,
                            weight_decay=5e-4)),
        [dict(type='PolyLR', power=0.9, begin=0, end=80000,
              by_epoch=False)])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (bs, H, W, 3), np.uint8),
                       jnp.float32)
    labels = jnp.asarray(rng.integers(0, num_classes, (bs, H, W), np.int32))
    state = create_train_state(model, tx,
                               dict(inputs=imgs, gt_seg_map=labels))
    tstep = make_train_step(model, tx, preprocessor=pre, amp=amp)
    return tstep, state, (imgs, labels)


def collect_trace(run_iters, trace_dir):
    """Run ``run_iters(n)`` under the profiler; return device events."""
    import jax
    jax.profiler.start_trace(trace_dir)
    run_iters()
    jax.profiler.stop_trace()
    path = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.trace.json.gz')))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    device_pids = {e['pid'] for e in tr['traceEvents']
                   if e.get('ph') == 'M' and e.get('name') == 'process_name'
                   and 'device' in str(e.get('args', {}).get('name', ''))}
    return [e for e in tr['traceEvents']
            if e.get('ph') == 'X' and e.get('pid') in device_pids]


def aggregate(events, iters):
    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    total = 0.0
    for e in events:
        name = e['name']
        if name.startswith('jit_'):          # whole-executable envelope
            total += e['dur']
            continue
        agg[name] += e['dur']
        cnt[name] += 1
    return ({n: d / iters for n, d in agg.items()},
            {n: c // iters for n, c in cnt.items()}, total / iters)


_OPNAME_RE = re.compile(
    r'%([\w.\-]+) = [^ ]+ (?:fusion|copy|custom-call|convolution|reduce|'
    r'dynamic-update-slice|pad|reshape|transpose|select-and-scatter|'
    r'reduce-window|all-reduce|bitcast-convert|convert|scatter|iota|'
    r'dot|broadcast|concatenate|slice|dynamic-slice|add|multiply|maximum)'
    r'[^\n]*?op_name="([^"]+)"')


def opname_map(hlo_text):
    """executable-op name -> jax op_name metadata path."""
    out = {}
    for m in _OPNAME_RE.finditer(hlo_text):
        out[m.group(1)] = m.group(2)
    return out


def shorten(path):
    """'jit(predict)/EncoderDecoder.predict/.../_backbone/stem_conv1/...'
    -> 'backbone/stem_conv1'."""
    parts = [p for p in path.split('/') if p]
    parts = [p for p in parts
             if not p.startswith('jit(') and '.' not in p
             and p not in ('conv', 'bn', 'act')]
    parts = [p.lstrip('_') for p in parts]
    return '/'.join(parts[:3]) if parts else path


def group_rows(per_op, counts, names):
    groups = collections.defaultdict(float)
    gcount = collections.defaultdict(int)
    for op, us in per_op.items():
        base = op.split('(')[0]
        path = names.get(base)
        if path is None:
            # pallas custom-calls keep their kernel name; strip instance ids
            key = re.sub(r'[.\d]+$', '', base) or base
            key = f'[{key}]'
        else:
            key = shorten(path)
            kind = ('copy' if base.startswith('copy')
                    else 'op')
            if kind == 'copy':
                key += ' (layout copy)'
        groups[key] += us
        gcount[key] += counts.get(op, 1)
    return sorted(groups.items(), key=lambda kv: -kv[1]), gcount


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', default='720x1280')
    ap.add_argument('--bs', type=int, default=1)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--train', action='store_true')
    ap.add_argument('--amp', action='store_true')
    ap.add_argument('--num-classes', type=int, default=2)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--out', default=None)
    ap.add_argument('--json', default=None)
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split('x'))

    import jax
    import jax.numpy as jnp

    if args.train:
        tstep, state, batch = build_train(H, W, args.bs,
                                          args.num_classes, amp=args.amp)
        state, logs = tstep(state, *batch)          # compile
        float(jax.device_get(logs['loss']))

        def run():
            nonlocal state
            for _ in range(args.iters):
                state, logs = tstep(state, *batch)
            float(jax.device_get(logs['loss']))
        hlo = tstep.lower(state, *batch).compile().as_text()
        label = f'train step {args.size} bs={args.bs}' + \
            (' amp' if args.amp else '')
    else:
        step, sargs = build_predict(H, W, args.num_classes)
        out = step(*sargs)                          # compile
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))

        def run():
            for _ in range(args.iters):
                out = step(*sargs)
            float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        hlo = step.lower(*sargs).compile().as_text()
        label = f'whole predict {args.size} bs={args.bs} bf16'

    with tempfile.TemporaryDirectory() as td:
        events = collect_trace(run, td)
    per_op, counts, exe_total = aggregate(events, args.iters)
    names = opname_map(hlo)
    rows, gcount = group_rows(per_op, counts, names)
    op_sum = sum(per_op.values())

    lines = [f'# Device-time profile: {label}',
             '',
             f'- device kind: {jax.devices()[0].device_kind}; '
             f'{args.iters} profiled iters (jax.profiler trace, device pid)',
             f'- whole-executable device time: **{exe_total:.0f} us/iter**; '
             f'sum of ops: {op_sum:.0f} us',
             '',
             '| module (op_name metadata) | device us/iter | ops |',
             '|---|---|---|']
    for key, us in rows[:args.top]:
        lines.append(f'| {key} | {us:.1f} | {gcount[key]} |')
    rest = sum(us for _, us in rows[args.top:])
    if rest:
        lines.append(f'| (everything else) | {rest:.1f} | — |')
    md = '\n'.join(lines)
    print(md)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(md + '\n')
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(dict(label=label, exe_total_us=exe_total,
                           groups=dict(rows)), f, indent=1)


if __name__ == '__main__':
    main()
