"""Torch-parity tests for the loss zoo (reference mmseg/models/losses/*).

Each test re-states the reference's math in torch (mmengine/mmcv are not
installed, so the formulas are restated from the behavioral specs in
SURVEY.md §2.5 and the reference sources: dice_loss.py, tversky_loss.py,
kldiv_loss.py, silog_loss.py, lovasz_loss.py) and checks our jnp
implementations value-for-value on random inputs.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import lednet_tpu

lednet_tpu.register_all_modules()

from lednet_tpu.models.losses import (  # noqa: E402
    DiceLoss, KLDivLoss, LovaszLoss, SiLogLoss, TverskyLoss)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _torch_dice(pred, target, use_sigmoid, activate, naive_dice, eps=1e-3,
                ignore_index=255):
    """Reference DiceLoss.forward (dice_loss.py:142-188 → :32-92)."""
    one_hot = target
    if pred.shape != target.shape:
        C = pred.shape[1]
        clamped = torch.clamp(target, min=0, max=C)
        one_hot = F.one_hot(clamped, C + 1)[..., :C].permute(0, 3, 1, 2)
    if activate:
        if use_sigmoid:
            pred = pred.sigmoid()
        elif pred.shape[1] != 1:
            pred = pred.softmax(dim=1)
    if ignore_index is not None and ignore_index < pred.shape[1]:
        keep = torch.arange(pred.shape[1]) != ignore_index
        pred = pred[:, keep]
        one_hot = one_hot[:, keep]
    p = pred.flatten(1)
    t = one_hot.flatten(1).float()
    a = torch.sum(p * t, 1)
    if naive_dice:
        b = torch.sum(p, 1)
        c = torch.sum(t, 1)
        d = (2 * a + eps) / (b + c + eps)
    else:
        b = torch.sum(p * p, 1) + eps
        c = torch.sum(t * t, 1) + eps
        d = (2 * a) / (b + c)
    return (1 - d).mean()


@pytest.mark.parametrize('use_sigmoid,naive', [(True, False), (True, True),
                                               (False, False), (False, True)])
def test_dice_multiclass_matches_torch(rng, use_sigmoid, naive):
    pred = rng.normal(size=(2, 4, 8, 9)).astype(np.float32)
    target = rng.integers(0, 4, size=(2, 8, 9)).astype(np.int64)
    target[0, :2, :3] = 255  # ignore pixels: preds still count (ref behavior)
    ref = _torch_dice(torch.from_numpy(pred), torch.from_numpy(target),
                      use_sigmoid, True, naive)
    ours = DiceLoss(use_sigmoid=use_sigmoid, naive_dice=naive)(
        jnp.asarray(np.moveaxis(pred, 1, -1)), jnp.asarray(target))
    assert abs(float(ours) - float(ref)) < 1e-5


def test_dice_single_channel_matches_torch(rng):
    # C=1: the reference's clamp-based one-hot yields the class-0 indicator
    pred = rng.normal(size=(2, 1, 8, 9)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 8, 9)).astype(np.int64)
    ref = _torch_dice(torch.from_numpy(pred), torch.from_numpy(target),
                      True, True, False)
    ours = DiceLoss(use_sigmoid=True)(
        jnp.asarray(np.moveaxis(pred, 1, -1)), jnp.asarray(target))
    assert abs(float(ours) - float(ref)) < 1e-5


def test_tversky_matches_torch(rng):
    pred = rng.normal(size=(3, 5, 6, 7)).astype(np.float32)
    target = rng.integers(0, 5, size=(3, 6, 7)).astype(np.int64)
    target[1, :3, :2] = 255
    tp_, alpha, beta, smooth = torch.from_numpy(pred), 0.3, 0.7, 1.0
    # reference tversky_loss.py: softmax, clamp one-hot (channel-last),
    # per-class per-sample binary tversky, mean over samples, /num_classes
    probs = tp_.softmax(dim=1)
    C = probs.shape[1]
    tt = torch.from_numpy(target)
    one_hot = F.one_hot(torch.clamp(tt, 0, C - 1), C)
    valid = (tt != 255).long()
    total = 0.0
    for i in range(C):
        p = probs[:, i].reshape(3, -1)
        t = one_hot[..., i].reshape(3, -1).float()
        v = valid.reshape(3, -1).float()
        TP = (p * t * v).sum(1)
        FP = (p * (1 - t) * v).sum(1)
        FN = ((1 - p) * t * v).sum(1)
        tv = (TP + smooth) / (TP + alpha * FP + beta * FN + smooth)
        total = total + (1 - tv).mean()
    ref = total / C
    ours = TverskyLoss()(jnp.asarray(np.moveaxis(pred, 1, -1)),
                         jnp.asarray(target))
    assert abs(float(ours) - float(ref)) < 1e-5


@pytest.mark.parametrize('reduction', ['mean', 'sum'])
@pytest.mark.parametrize('temperature', [1.0, 4.0])
def test_kldiv_matches_torch(rng, reduction, temperature):
    a = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    b = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    # reference kldiv_loss.py:67-84 — note it passes softmax PROBS as the
    # (log-expected) input of F.kl_div; we reproduce its actual behavior
    inp = F.softmax(ta / temperature, dim=1)
    tgt = F.softmax(tb / temperature, dim=1)
    loss = F.kl_div(inp, tgt, reduction='none', log_target=False)
    loss = loss * temperature ** 2
    loss = loss.view(2, -1)
    ref = loss.sum(1) if reduction == 'sum' else loss.mean(1)
    ours = KLDivLoss(temperature=temperature, reduction=reduction)(
        jnp.asarray(np.moveaxis(a, 1, -1)), jnp.asarray(np.moveaxis(b, 1, -1)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_silog_matches_torch(rng):
    pred = np.abs(rng.normal(size=(3, 1, 8, 9))).astype(np.float32) * 5
    target = np.abs(rng.normal(size=(3, 8, 9))).astype(np.float32) * 5
    target[0, :4, :] = 0.0  # invalid depth
    eps = 1e-6
    p = torch.from_numpy(pred)[:, 0].flatten(1)
    t = torch.from_numpy(target).flatten(1)
    diff = torch.log(t.clamp(min=eps)) - torch.log(p.clamp(min=eps))
    valid = ((t > eps) & ~torch.isnan(diff)).float()
    diff = diff * valid
    n = valid.sum(1).clamp(min=eps)
    sq_mean = (diff.pow(2) * valid).sum(1) / n
    mean = (diff * valid).sum(1) / n
    ref = torch.sqrt(sq_mean - 0.5 * mean.pow(2)).mean()
    ours = SiLogLoss()(jnp.asarray(np.moveaxis(pred, 1, -1)),
                       jnp.asarray(target))
    assert abs(float(ours) - float(ref)) < 1e-5


def _torch_lovasz_grad(gt_sorted):
    gts = gt_sorted.sum()
    intersection = gts - gt_sorted.float().cumsum(0)
    union = gts + (1 - gt_sorted).float().cumsum(0)
    jaccard = 1.0 - intersection / union
    p = len(gt_sorted)
    if p > 1:
        jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
    return jaccard


def test_lovasz_softmax_matches_torch(rng):
    pred = rng.normal(size=(2, 4, 8, 9)).astype(np.float32)
    target = rng.integers(0, 4, size=(2, 8, 9)).astype(np.int64)
    target[:, :2, :2] = 255
    # reference lovasz_loss.py: flatten_probs drops ignore pixels, then
    # per-class |fg - prob| sorted desc, dot with lovasz grad, mean over
    # present classes
    probs = torch.from_numpy(pred).softmax(1)
    B, C = probs.shape[:2]
    flat = probs.permute(0, 2, 3, 1).reshape(-1, C)
    labels = torch.from_numpy(target).reshape(-1)
    keep = labels != 255
    flat, labels = flat[keep], labels[keep]
    losses = []
    for c in range(C):
        fg = (labels == c).float()
        if fg.sum() == 0:
            continue
        errors = (fg - flat[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        grad = _torch_lovasz_grad(fg[perm])
        losses.append(torch.dot(errors_sorted, grad))
    ref = torch.stack(losses).mean()
    ours = LovaszLoss(reduction='none')(
        jnp.asarray(np.moveaxis(pred, 1, -1)), jnp.asarray(target))
    assert abs(float(ours) - float(ref)) < 1e-5


def test_lovasz_binary_matches_torch(rng):
    logits = rng.normal(size=(2, 8, 9)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 8, 9)).astype(np.int64)
    target[0, 0, :3] = 255
    tl = torch.from_numpy(logits).reshape(-1)
    tt = torch.from_numpy(target).reshape(-1)
    keep = tt != 255
    tl, tt = tl[keep], tt[keep]
    signs = 2.0 * tt.float() - 1.0
    errors = 1.0 - tl * signs
    errors_sorted, perm = torch.sort(errors, 0, descending=True)
    grad = _torch_lovasz_grad(tt[perm].float())
    ref = torch.dot(F.relu(errors_sorted), grad)
    ours = LovaszLoss(loss_type='binary', reduction='none')(
        jnp.asarray(logits), jnp.asarray(target))
    assert abs(float(ours) - float(ref)) < 1e-5
