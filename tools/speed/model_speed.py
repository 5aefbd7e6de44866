#!/usr/bin/env python
"""Standalone latency/FLOPs rig for any registered model family.

Reference analogue: the ``tools/speed/*_speed.py`` rigs (thop FLOPs + cuda-
sync FPS loops for DDRNet1/PIDNet/DSNet variants, ~4.7 kLoC of copies).
One parameterized rig replaces them: pick a backbone/full-model config by
name, measure params, XLA-cost FLOPs, and honest chained FPS
(``lednet_tpu/utils/timing.py`` — ``block_until_ready`` acks dispatch on
this stack, so sync-bracket loops are invalid) at a given shape, in f32
and bf16.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import json
import time

PRESETS = {
    'lednet': dict(type='LEDNet', channels=32, ppm_channels=128),
    'lednet-wide': dict(type='LEDNet', channels=32, ppm_channels=128,
                        mlp_ratio=4.0),
    'lednet-slim': dict(type='LEDNet', channels=32, ppm_channels=128,
                        stem_blocks=1, mlp_ratio=2.0),
    'ddrnet': dict(type='DDRNet', channels=32, ppm_channels=128),
    'ddrnet23': dict(type='DDRNet', channels=64, ppm_channels=128),
    'pidnet-s': dict(type='PIDNet', channels=32, ppm_channels=96),
    'pidnet-m': dict(type='PIDNet', channels=64, ppm_channels=96,
                     num_stem_blocks=2),
    'pidnet-l': dict(type='PIDNet', channels=64, ppm_channels=112,
                     num_stem_blocks=3),
    'bisenetv2': dict(type='BiSeNetV2'),
    'fastscnn': dict(type='FastSCNN'),
    'stdc1': dict(type='STDCNet', stdc_type='STDCNet1',
                  channels=(32, 64, 256, 512, 1024), bottleneck_type='cat',
                  norm_cfg=dict(type='BN'), act_cfg=dict(type='ReLU')),
    'mscan-t': dict(type='MSCAN'),
    'mit-b0': dict(type='MixVisionTransformer', embed_dims=32,
                   num_layers=(2, 2, 2, 2)),
    'rtformer-slim': dict(type='RTFormer', base_channels=32,
                          high_channels=64),
    'rtformer-base': dict(type='RTFormer', base_channels=64,
                          high_channels=128),
}


def main():
    p = argparse.ArgumentParser(description='model speed rig')
    p.add_argument('model', choices=sorted(PRESETS), nargs='?',
                   default='lednet')
    p.add_argument('--shape', type=int, nargs=2, default=[720, 1280],
                   metavar=('H', 'W'))
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--dtype', choices=['f32', 'bf16'], default='bf16')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import lednet_tpu
    from lednet_tpu.registry import MODELS
    from lednet_tpu.utils.precision import cast_floating

    lednet_tpu.register_all_modules()
    model = MODELS.build(dict(PRESETS[args.model]))
    h, w = args.shape
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    from lednet_tpu.engine.state import jit_init
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    n_params = sum(int(np.prod(q.shape))
                   for q in jax.tree.leaves(variables['params']))

    if args.dtype == 'bf16':
        variables = dict(variables)
        variables['params'] = cast_floating(variables['params'], jnp.bfloat16)
        x = x.astype(jnp.bfloat16)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    lowered = fwd.lower(variables, x)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = cost.get('flops', float('nan'))
    except Exception:
        flops = float('nan')

    from lednet_tpu.utils.timing import chain_slope

    def chained_fwd(v, img, eps):
        out = model.apply(v, img + eps.astype(img.dtype), train=False)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree.leaves(out))

    r = chain_slope(chained_fwd, (variables, x), k=(1, 4), reps=6)
    dt = r['per_op_s']

    print(json.dumps(dict(
        model=args.model, shape=[h, w], dtype=args.dtype,
        params_m=round(n_params / 1e6, 3),
        gflops=round(flops / 1e9, 3),
        latency_ms=round(dt * 1000, 3),
        fps=round(1 / dt, 2),
        device=str(jax.devices()[0]))))


if __name__ == '__main__':
    main()
