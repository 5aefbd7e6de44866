"""Standalone heavy half of the BASELINE measurement protocol.

The driver ``bench.py`` keeps the fast honest measurements (720p bs=1
headline, 1024^2 whole, train steps); this tool records the heavier ones —
slide-mode 1024x2048 (the Cityscapes frame protocol,
reference ``tools/analysis_tools/benchmark.py`` with
``test_cfg.mode='slide'``) and bs=8 batched throughput — with the same
chained honest timing.  Results are committed at docs/full_protocol.json.

Usage (real chip):  python tools/speed/full_protocol.py [--out PATH]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.engine.state import jit_init
    from lednet_tpu.models.data_preprocessor import SegDataPreProcessor
    from lednet_tpu.registry import MODELS
    from lednet_tpu.utils.precision import cast_floating
    from lednet_tpu.utils.timing import chain_slope

    t0 = time.time()
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', in_channels=3, channels=32,
                      ppm_channels=128, align_corners=False),
        decode_head=dict(type='LEDHead', in_channels=128, channels=64,
                         dropout_ratio=0.0, num_classes=2,
                         align_corners=False),
        test_cfg=dict(mode='slide', crop_size=(1024, 1024),
                      stride=(768, 768))))
    pre_pack = SegDataPreProcessor(
        mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
        bgr_to_rgb=True, out_dtype=jnp.bfloat16, pack_s2d=True)
    pre_plain = SegDataPreProcessor(
        mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
        bgr_to_rgb=True, out_dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 720, 1280, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x0, train=False)
    params = cast_floating(variables['params'], jnp.bfloat16)
    batch_stats = variables.get('batch_stats', {})
    rng = np.random.default_rng(0)
    out = {'device': str(jax.devices()[0].device_kind),
           'protocol': 'chain_slope (lednet_tpu.utils.timing)'}

    def fwd(params, batch_stats, img, eps):
        img2, _, _ = pre_pack(img + eps, None, training=False)
        o = model.apply({'params': params, 'batch_stats': batch_stats},
                        img2, method='predict')
        return jnp.sum(o.astype(jnp.float32))

    def fwd_slide(params, batch_stats, img, eps):
        img2, _, _ = pre_plain(img + eps, None, training=False)
        o = model.apply({'params': params, 'batch_stats': batch_stats},
                        img2, method='predict_slide')
        return jnp.sum(o.astype(jnp.float32))

    # k=(1,8) puts >=100 ms of chained device signal against the 40-60 ms
    # tunnel-RTT jitter (k=(1,2) gave slopes off by up to 2x run-to-run —
    # same finding as bench.py's headline spread, 2026-08-22).
    def measure(shape, slide=False, k=(1, 8), reps=7):
        frame = jnp.asarray(rng.integers(0, 255, shape, np.uint8),
                            jnp.float32)
        f = fwd_slide if slide else fwd
        r = chain_slope(f, (params, batch_stats, frame), k=k, reps=reps)
        return dict(ms=round(r['per_op_s'] * 1e3, 3),
                    img_per_s=round(shape[0] / r['per_op_s'], 1),
                    ms_median_slope=round(r['per_op_med_s'] * 1e3, 3))

    out['whole_1024_bs8'] = measure((8, 1024, 1024, 3))
    out['whole_720p_bs8'] = measure((8, 720, 1280, 3))
    try:
        out['slide_1024x2048_bs1'] = measure((1, 1024, 2048, 3), slide=True)
    except Exception as e:  # slide VMEM pressure is environment-sensitive
        out['slide_1024x2048_bs1'] = dict(error=repr(e)[:200])
    out['wall_s'] = round(time.time() - t0, 1)
    line = json.dumps(out, indent=1)
    print(line)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()
