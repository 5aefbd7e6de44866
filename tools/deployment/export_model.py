#!/usr/bin/env python
"""AOT-export a trained model for serving.

Reference analogue: ``tools/deployment/pytorch2torchscript.py`` (TorchScript
trace export). The TPU-native equivalent is ``jax.export``: the jitted
predict function is lowered/serialized to a portable StableHLO artifact that
a serving process can load and run without the model-building python code.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse


def parse_args():
    p = argparse.ArgumentParser(description='AOT export (StableHLO)')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--output-file', default='model.stablehlo')
    p.add_argument('--shape', type=int, nargs='+', default=[720, 1280])
    p.add_argument('--bf16', action='store_true', default=True)
    p.add_argument('--verify', action='store_true',
                   help='round-trip the artifact and compare outputs')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    import lednet_tpu
    from lednet_tpu.config import Config
    from lednet_tpu.engine.runner import Runner
    from lednet_tpu.utils.precision import cast_floating

    lednet_tpu.register_all_modules()
    cfg = Config.fromfile(args.config)
    runner = Runner(cfg, work_dir='./work_dirs/export')
    if args.checkpoint:
        runner.load(args.checkpoint)
    else:
        runner.init_state()

    h, w = args.shape if len(args.shape) == 2 else (args.shape[0],) * 2
    params = runner.state.params
    batch_stats = runner.state.batch_stats
    if args.bf16:
        params = cast_floating(params, jnp.bfloat16)
    model = runner.model
    pre = runner.preprocessor

    def serve_fn(img):
        x = img
        if pre is not None:
            x, _, _ = pre(x, None, training=False)
        if args.bf16:
            x = x.astype(jnp.bfloat16)
        logits = model.apply({'params': params, 'batch_stats': batch_stats},
                             x, method='predict')
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    x_spec = jax.ShapeDtypeStruct((1, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(serve_fn))(x_spec)
    blob = exported.serialize()
    with open(args.output_file, 'wb') as f:
        f.write(blob)
    print(f'exported {len(blob)} bytes -> {args.output_file}')

    if args.verify:
        restored = jexport.deserialize(blob)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 255, (1, h, w, 3), np.uint8))
        # compare jitted-vs-artifact: eager execution fuses differently and
        # bf16 near-ties can flip argmax on a fraction of pixels
        ref = np.asarray(jax.jit(serve_fn)(img))
        out = np.asarray(restored.call(img))
        agree = float((ref == out).mean())
        assert agree >= 0.995, \
            f'round-trip disagreement too high: {1 - agree:.4%} of pixels'
        print(f'round-trip verified ({agree:.4%} pixel agreement)')


if __name__ == '__main__':
    main()
