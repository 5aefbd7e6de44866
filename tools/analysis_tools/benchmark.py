#!/usr/bin/env python
"""FPS benchmark harness — the reference's north-star measurement.

CLI and JSON schema match the reference ``tools/analysis_tools/benchmark.py``
(``:37-122``): batch size 1, ``--repeat-times`` mean/variance, JSON output
with the same keys (``overall_fps_N``, ``average_fps``).

The CLOCK differs from the reference on purpose: on this stack
``block_until_ready`` acknowledges DISPATCH, not completion (it measured a
0.36 ms "latency" for a forward whose true device time is ~3.5 ms), so the
reference's per-iter sync bracket is replaced by the chained honest
protocol of ``lednet_tpu/utils/timing.py`` — K data-chained forwards in
one program, hard-synced by ``device_get`` of a scalar, per-image time =
the K-vs-K wall slope.  Each ``--repeat-times`` rep re-fits the slope from
fresh walls.  See docs/latency.md for the doctrine and the numbers.

If the configured dataset isn't on disk, ``--synthetic HxW`` benchmarks on
random data of that size (default 1280x720, the paper's FPS protocol).
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import json
import os.path as osp
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='TPU segmentor benchmark')
    p.add_argument('config', help='config file path')
    p.add_argument('checkpoint', nargs='?', default=None,
                   help='checkpoint dir (optional: random init if absent)')
    p.add_argument('--log-interval', type=int, default=50)
    p.add_argument('--work-dir', default=None)
    p.add_argument('--repeat-times', type=int, default=1)
    p.add_argument('--num-iters', type=int, default=200)
    p.add_argument('--num-warmup', type=int, default=5)
    p.add_argument('--synthetic', default=None,
                   help='HxW for synthetic input (e.g. 720x1280); used when '
                        'the dataset is unavailable')
    p.add_argument('--profile', default=None, metavar='TRACE_DIR',
                   help='capture a jax.profiler trace of 20 iterations into '
                        'TRACE_DIR (view with tensorboard / xprof)')
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import lednet_tpu
    from lednet_tpu.config import Config
    from lednet_tpu.engine.runner import Runner
    from lednet_tpu.engine.state import make_eval_step

    lednet_tpu.register_all_modules()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(kv.split('=', 1) for kv in args.cfg_options))

    runner = Runner(cfg, work_dir=args.work_dir or './work_dirs/benchmark')
    if args.checkpoint:
        runner.load(args.checkpoint)
    else:
        runner.init_state()
    eval_step = make_eval_step(runner.model, runner.preprocessor,
                               mode=runner.test_mode)

    # data source: dataset batches if available, else synthetic frames
    def synthetic_frames(hw):
        h, w = hw
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (1, h, w, 3), np.uint8)
        while True:
            yield frame

    frames = None
    if args.synthetic:
        h, w = (int(v) for v in args.synthetic.split('x'))
        frames = synthetic_frames((h, w))
    else:
        try:
            from lednet_tpu.datasets.loader import build_dataloader
            loader = build_dataloader(dict(cfg.test_dataloader),
                                      default_batch_size=1)
            if len(loader.dataset) == 0:
                raise FileNotFoundError
            # cycle over at most warmup+num_iters frames: small datasets
            # would exhaust a plain generator (the reference assumes
            # len >= 205), and caching more would hold the whole decoded
            # dataset in host memory on large ones
            import itertools
            need = args.num_iters + args.num_warmup + 1
            frames = itertools.cycle(
                itertools.islice((b['inputs'] for b in loader), need))
        except Exception:
            print('dataset unavailable; falling back to synthetic 720x1280')
            frames = synthetic_frames((720, 1280))

    if args.profile:
        # warm up, then trace 20 steps (SURVEY.md §5.1: the reference has no
        # profiler integration; jax.profiler traces are the TPU upgrade)
        frame = next(frames)
        out = eval_step(runner.state, jnp.asarray(np.asarray(frame)))
        jax.block_until_ready(out)
        with jax.profiler.trace(args.profile):
            for _ in range(20):
                out = eval_step(runner.state, jnp.asarray(np.asarray(frame)))
            jax.block_until_ready(out)
        print(f'profiler trace written to {args.profile}')

    # honest chained measurement (see module docstring): one fn that folds
    # the chaining eps into the input and reduces the logits to a scalar
    from lednet_tpu.utils.timing import chain_slope

    model, pre, test_mode = runner.model, runner.preprocessor, runner.test_mode
    method = 'predict_slide' if test_mode == 'slide' else 'predict'

    def fwd(params, batch_stats, img, eps):
        x = img + eps
        if pre is not None:
            x, _, _ = pre(x, None, training=False)
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          x, method=method)
        return jnp.sum(out.astype(jnp.float32))

    frame = jnp.asarray(np.asarray(next(frames)), jnp.float32)
    margs = (runner.state.params, runner.state.batch_stats, frame)

    benchmark_dict = dict(config=args.config, unit='img / s',
                          protocol='chain_slope (honest device time; '
                                   'see lednet_tpu/utils/timing.py)')
    overall_fps_list = []
    for rep in range(args.repeat_times):
        r = chain_slope(fwd, margs, k=(1, 4), reps=6)
        fps = frame.shape[0] / r['per_op_s']
        print(f'Overall fps: {fps:.2f} img / s '
              f'({r["per_op_s"] * 1e3:.3f} ms/img)\n')
        benchmark_dict[f'overall_fps_{rep + 1}'] = round(fps, 2)
        overall_fps_list.append(fps)
    benchmark_dict['average_fps'] = round(float(np.mean(overall_fps_list)), 2)
    benchmark_dict['fps_variance'] = round(float(np.var(overall_fps_list)), 4)
    print(json.dumps(benchmark_dict, indent=2))
    if args.work_dir:
        with open(osp.join(args.work_dir, 'benchmark.json'), 'w') as f:
            json.dump(benchmark_dict, f)
    return benchmark_dict


if __name__ == '__main__':
    main()
