"""Outcome-level training parity: a shortened torch-vs-jax race (VERDICT #1).

The full experiment (2500 iters x 3 seeds, `tools/parity/train_race.py`)
is recorded in docs/parity_race.json; this keeps a single-seed shortened
race in the slow tier so the outcome-parity claim stays continuously
verified: same DDRNet-slim, same transplanted init, same synthetic 4-class
data and matched aug, full SGD+poly+OHEM recipe, same IoUMetric verdict.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools', 'parity'))

from train_race import gen_dataset, run_jax, run_torch  # noqa: E402

ITERS, SEED = 2000, 0


@pytest.mark.slow
def test_training_race_outcome_parity():
    """Race to (near-)convergence, where the gate is meaningful.

    Calibration (measured 2026-08-21): at 500 iters the mIoU of this setup
    is chaotic — five torch reruns whose init was kicked by N(0, 1e-6)
    landed at [49.14, 49.41, 36.04, 41.44, 36.71] vs the base run's 47.91,
    a ~13-point intrinsic scatter — so a mid-training comparison can't
    separate framework divergence from chaos; and even late, single
    checkpoints bounce (torch seed-0: 70.85 @2000 vs 78.66 @2500).  Hence:
    run to 2000 iters and average the last five checkpoints (the rig's
    late-checkpoint averaging), then gate at 8.0 — calibrated by the
    round-5 bias study (``tools/parity/race_bias.py``,
    ``docs/race_bias.json``): over 7 seeds the paired jax-torch gap is
    +0.18 ± 3.12 mIoU (t=0.15, sign flips across seeds) and the
    single-framework chaos floor (torch vs torch + 1e-7 grad noise) is
    2.2–7.6 mIoU, so 8.0 ≈ 2.6 paired σ catches systematic
    optimizer/BN/loss divergence without chasing fp-chaos.
    """
    data = gen_dataset(SEED)
    quiet = lambda *a: None  # noqa: E731
    evals = tuple(range(ITERS - 400, ITERS, 100))
    rt = run_torch(SEED, ITERS, data, log=quiet, eval_iters=evals)
    rj = run_jax(SEED, ITERS, data, log=quiet, eval_iters=evals)
    # both frameworks converged on the task ...
    assert rt['miou'] > 60, rt
    assert rj['miou'] > 60, rj
    # ... and to the same accuracy.
    gap = abs(rt['miou'] - rj['miou'])
    assert gap <= 8.0, (
        f'jax-torch converged mIoU gap {gap:.2f} '
        f'(torch {rt["miou"]}, jax {rj["miou"]})')
