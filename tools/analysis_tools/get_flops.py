#!/usr/bin/env python
"""Model complexity: params + FLOPs via XLA cost analysis.

Reference analogue: ``tools/analysis_tools/get_flops.py`` (mmengine
complexity info; fork default shape 1280x720 at ``:37-38``). Here the FLOP
count comes from the compiled HLO's cost analysis — the number XLA actually
schedules, not a per-module estimate.

Counting conventions: mmengine (and thop, the paper's tool) report
multiply-accumulates as "FLOPs"; XLA counts a MAC as 2 flops. We print both.
The analysis runs on the CPU backend by default: the TPU backend's cost
analysis charges convs at lane-padded width (depthwise/grouped convs with
<128 channels get counted ~2.6x high on LED-Net), so the CPU count is the
hardware-independent algorithmic number comparable to the reference's
(measured: LED-Net @1280x720 = 10.09 G-MACs vs the paper's 9.206 G, the
residue being BN/resize/attention ops thop does not count). Pass
``--backend tpu`` for the device-scheduled count.
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
    p.add_argument('--backend', default='cpu', choices=['cpu', 'tpu', 'axon'],
                   help='backend whose cost analysis to report (cpu = '
                        'hardware-independent algorithmic count)')
    return p.parse_args()


def main():
    args = parse_args()
    import os
    if args.backend == 'cpu':
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.backend == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
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
    print(f'FLOPs (XLA cost analysis, 1 MAC = 2 flops): {flops / 1e9:.3f} G')
    print(f'FLOPs (mmengine/thop MAC convention): {flops / 2e9:.3f} G')
    print('=' * 40)


if __name__ == '__main__':
    main()
