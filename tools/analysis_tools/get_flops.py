#!/usr/bin/env python
"""Model complexity: params + FLOPs via XLA cost analysis.

Reference analogue: ``tools/analysis_tools/get_flops.py`` (mmengine
complexity info; fork default shape 1280x720 at ``:37-38``). Here the FLOP
count comes from the compiled HLO's cost analysis — the number XLA actually
schedules, not a per-module estimate.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse


def parse_args():
    p = argparse.ArgumentParser(description='Get a TPU segmentor complexity')
    p.add_argument('config', help='config file path')
    p.add_argument('--shape', type=int, nargs='+', default=[1280, 720],
                   help='input image size (fork default 1280x720)')
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import lednet_tpu
    from lednet_tpu.config import Config
    from lednet_tpu.registry import MODELS

    lednet_tpu.register_all_modules()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(kv.split('=', 1) for kv in args.cfg_options))
    if len(args.shape) == 1:
        h = w = args.shape[0]
    else:
        w, h = args.shape  # reference passes (W, H)

    model = MODELS.build(dict(cfg.model))
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    from lednet_tpu.engine.state import jit_init
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables['params']))

    def fwd(v, x):
        return model.apply(v, x, method='predict')

    lowered = jax.jit(fwd).lower(variables, x)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = analysis.get('flops', float('nan'))
    except Exception:
        flops = float('nan')

    print('=' * 40)
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Params: {n_params / 1e6:.3f} M')
    print(f'FLOPs (XLA cost analysis): {flops / 1e9:.3f} G')
    print('=' * 40)


if __name__ == '__main__':
    main()
