"""Long(er)-run training stability at MATCHED train/eval scale (VERDICT #2).

The short-fixture runs prove the loop moves; this proves the learned state
is usable in EVAL mode — running BN statistics, not batch statistics — after
~2k iterations of the reference recipe (SGD+momentum+poly+OHEM). Train and
eval run at the same 64x64 scale per the toy-scale BN gotcha (global modules
make activation statistics input-size-dependent; see
.claude/skills/verify/SKILL.md).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401
from lednet_tpu.engine.optim import build_optimizer
from lednet_tpu.engine.state import (create_train_state, make_eval_step,
                                     make_train_step)

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

SIZE, BS, N_ITERS = 64, 4, 2000


def _sample(rng):
    """Bright diagonal band on dark noise; label = the band."""
    img = rng.normal(40, 12, (SIZE, SIZE, 3)).astype(np.float32)
    c = rng.integers(-20, 20)
    w = rng.integers(3, 7)
    ii, jj = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing='ij')
    band = np.abs(ii - jj - c) < w
    img[band] = rng.normal(200, 10, (band.sum(), 3))
    return img, band.astype(np.int32)


def _iou(pred, label):
    inter = np.logical_and(pred == 1, label == 1).sum()
    union = np.logical_or(pred == 1, label == 1).sum()
    return inter / max(union, 1)


def test_2k_iter_training_stable_eval_miou():
    rng = np.random.default_rng(0)
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', channels=16, ppm_channels=32),
        decode_head=dict(
            type='LEDHead', in_channels=64, channels=16, num_classes=2,
            dropout_ratio=0.0,
            loss_decode=[
                dict(type='OhemCrossEntropy', thres=0.9, min_kept=512,
                     loss_weight=1.0),
                dict(type='OhemCrossEntropy', thres=0.9, min_kept=512,
                     loss_weight=0.4)])))
    tx, _ = build_optimizer(
        dict(optimizer=dict(type='SGD', lr=0.01, momentum=0.9,
                            weight_decay=5e-4)),
        [dict(type='PolyLR', power=0.9, begin=0, end=N_ITERS,
              by_epoch=False)])

    # a fixed pool of train batches + a held-out eval set
    pool = [_sample(rng) for _ in range(64)]
    val = [_sample(rng) for _ in range(8)]
    val_imgs = jnp.asarray(np.stack([v[0] for v in val]))
    val_lbls = np.stack([v[1] for v in val])

    state = create_train_state(model, tx, dict(
        inputs=jnp.zeros((BS, SIZE, SIZE, 3)),
        gt_seg_map=jnp.zeros((BS, SIZE, SIZE), jnp.int32)))
    step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    def eval_iou(state):
        logits = eval_step(state, val_imgs)  # EVAL mode: running BN stats
        pred = np.asarray(jnp.argmax(logits, -1))
        return float(np.mean([_iou(p, l) for p, l in zip(pred, val_lbls)]))

    order = np.random.default_rng(1)
    ious = []
    for i in range(N_ITERS):
        idx = order.integers(0, len(pool), BS)
        imgs = jnp.asarray(np.stack([pool[j][0] for j in idx]))
        lbls = jnp.asarray(np.stack([pool[j][1] for j in idx]))
        state, logs = step(state, imgs, lbls)
        if (i + 1) % 500 == 0:
            ious.append(eval_iou(state))

    # learned AND stable in eval mode: the last two checkpoints both good
    assert ious[-1] > 0.7, f'eval-mode IoU trajectory: {ious}'
    assert ious[-2] > 0.7, f'eval-mode IoU trajectory: {ious}'
    # no eval-mode collapse relative to the best point
    assert ious[-1] > 0.6 * max(ious), f'collapsed: {ious}'
