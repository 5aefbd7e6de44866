"""Diagnose the paired torch-vs-jax race bias (VERDICT r3 #4 / r4 #9).

Round 3's outcome race showed jax beating torch by ~+2.0 mIoU on all 3
seeds — inside the 12-point cross-seed spread, but PAIRED-consistent,
which a pure fp-chaos explanation does not predict.  This rig decomposes
the gap with three instruments:

1. **Paired-gap statistic over more seeds** — mean, paired std, and a
   t-statistic of (jax − torch) per seed, with the late-checkpoint
   averaging of ``train_race.py`` (mIoU mean over the last 5 checkpoints).
2. **Cross-framework weight evaluation** — the jax-trained weights are
   transplanted into the torch mirror modules (the tested
   ``_copy_backbone``/``_copy_head`` infrastructure) and re-scored with the
   torch eval loop, and the jax eval additionally re-runs per-sample
   (bs=1).  If torch-eval-of-jax-weights ≈ jax-eval-of-jax-weights, the
   bias is TRAINING dynamics, not a scoring/eval-path artifact.
3. **Chaos floor** — torch vs torch-with-1e-7-multiplicative-grad-noise
   (pure fp-divergence model, same framework, same everything): the paired
   |gap| this produces is the noise floor a real bias must clear.

Output: docs/race_bias.json + a verdict line.

Usage (CPU; ~1-2 h on the 1-core host):
  python tools/parity/race_bias.py --seeds 0,1,2,3,4,5,6 --iters 2500
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
sys.path.insert(0, os.path.join(_REPO, 'tools', 'parity'))


def jax_eval_per_sample(state, vimgs, vlabs):
    """Re-score the jax weights one image at a time (vs the batched val)."""
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.engine.state import make_eval_step
    from train_race import _init_params, _miou, NCLS  # noqa: F401
    # rebuild the model topology only (params come from `state`)
    model, _ = _init_params(0)
    eval_step = make_eval_step(model)
    preds = []
    for v in vimgs:
        logits = eval_step(state, jnp.asarray(v[None]))
        preds.append(np.asarray(jnp.argmax(logits, -1))[0])
    return _miou(np.stack(preds), vlabs)[0]


def torch_eval_of_jax_state(state, vimgs, vlabs):
    """Transplant the jax-trained weights into the torch mirrors, score
    with the torch eval loop."""
    import jax
    from test_ddrnet_parity import TDDRNet, C
    from test_train_parity import THead, _copy_backbone, _copy_head
    from train_race import NCLS, _torch_eval
    p = jax.device_get(state.params)
    s = jax.device_get(state.batch_stats)
    tb, th = TDDRNet(), THead(cin=4 * C, ch=2 * C, ncls=NCLS)
    _copy_backbone(tb, p['_backbone'], s['_backbone'])
    _copy_head(th, p['_decode_head'], s['_decode_head'])
    return _torch_eval(tb, th, vimgs, vlabs)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', default='0,1,2,3,4,5,6')
    ap.add_argument('--iters', type=int, default=2500)
    ap.add_argument('--chaos-seeds', default='0,1,2')
    ap.add_argument('--out', default='docs/race_bias.json')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import lednet_tpu
    lednet_tpu.register_all_modules()
    from train_race import gen_dataset, run_jax, run_torch

    seeds = [int(s) for s in args.seeds.split(',')]
    eval_iters = tuple(range(args.iters - 400, args.iters, 100))
    out = dict(config=vars(args), pairs=[], chaos=[])
    t_start = time.time()

    def save():
        with open(args.out, 'w') as f:
            json.dump(out, f, indent=1)

    # ---- 1+2) paired runs with cross-framework eval ------------------
    for seed in seeds:
        data = gen_dataset(seed)
        rj = run_jax(seed, args.iters, data, eval_iters=eval_iters,
                     return_state=True)
        state = rj.pop('state')
        rt = run_torch(seed, args.iters, data, eval_iters=eval_iters)
        cross = torch_eval_of_jax_state(state, data[2], data[3])
        per_sample = jax_eval_per_sample(state, data[2], data[3])
        pair = dict(
            seed=seed, jax=rj['miou'], torch=rt['miou'],
            gap=round(rj['miou'] - rt['miou'], 2),
            jax_final=rj['miou_by_iter'][args.iters],
            torch_final=rt['miou_by_iter'][args.iters],
            # eval-path probes on the FINAL jax checkpoint:
            jax_final_torch_eval=round(float(cross), 2),
            jax_final_per_sample_eval=round(float(per_sample), 2))
        out['pairs'].append(pair)
        print(json.dumps(pair), flush=True)
        save()

    gaps = np.array([p['gap'] for p in out['pairs']], np.float64)
    n = len(gaps)
    paired = dict(
        n=n, mean_gap=round(float(gaps.mean()), 3),
        paired_std=round(float(gaps.std(ddof=1)), 3) if n > 1 else None,
        t_stat=round(float(gaps.mean() / (gaps.std(ddof=1) / np.sqrt(n))),
                     2) if n > 1 and gaps.std(ddof=1) > 0 else None)
    # eval-path verdict: does re-scoring the same weights move the number?
    ev = np.array([p['jax_final_torch_eval'] - p['jax_final']
                   for p in out['pairs']])
    paired['cross_eval_mean_delta'] = round(float(ev.mean()), 3)
    out['paired'] = paired
    print(json.dumps(paired), flush=True)
    save()

    # ---- 3) chaos floor: torch vs torch + 1e-7 grad noise ------------
    for seed in [int(s) for s in args.chaos_seeds.split(',')]:
        data = gen_dataset(seed)
        ra = run_torch(seed, args.iters, data, eval_iters=eval_iters)
        rb = run_torch(seed, args.iters, data, eval_iters=eval_iters,
                       grad_noise=1e-7, perturb_seed=seed + 100)
        c = dict(seed=seed, a=ra['miou'], b=rb['miou'],
                 gap=round(rb['miou'] - ra['miou'], 2))
        out['chaos'].append(c)
        print(json.dumps(c), flush=True)
        save()
    cg = np.array([c['gap'] for c in out['chaos']], np.float64)
    out['chaos_floor'] = dict(
        mean_abs_gap=round(float(np.abs(cg).mean()), 3),
        mean_gap=round(float(cg.mean()), 3))

    out['wall_s'] = round(time.time() - t_start, 1)
    # verdict: a real bias must (a) clear the chaos floor, (b) survive
    # cross-framework eval (i.e. not be a scoring artifact)
    out['verdict'] = dict(
        eval_artifact=bool(abs(paired['cross_eval_mean_delta']) > 0.5),
        above_chaos_floor=bool(
            abs(paired['mean_gap']) > 2 * out['chaos_floor']['mean_abs_gap']
            if out['chaos'] else None))
    save()
    print(json.dumps(out['verdict']), flush=True)


if __name__ == '__main__':
    main()
