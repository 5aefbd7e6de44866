"""The rest of the reference's loss zoo (SURVEY.md §2.5).

Behavioral specs: ``mmseg/models/losses/{boundary_loss, dice_loss,
focal_loss, tversky_loss, kldiv_loss, silog_loss, lovasz_loss}.py``. All are
static-shape masked reductions over NHWC logits / (B, H, W) labels; the
reference's CUDA ``sigmoid_focal_loss`` (mmcv op) is replaced by the plain
jnp formulation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS


@MODELS.register_module()
class BoundaryLoss:
    """Class-balanced BCE on the 1-channel boundary logit (PIDNet-style;
    reference ``boundary_loss.py:33-58``): positive pixels weighted by the
    negative fraction and vice versa."""

    def __init__(self, loss_weight: float = 1.0,
                 loss_name: str = 'loss_boundary'):
        self.loss_weight = loss_weight
        self.loss_name = loss_name

    def __call__(self, bd_pre, bd_gt, **kwargs):
        x = bd_pre[..., 0].astype(jnp.float32) if bd_pre.ndim == 4 else \
            bd_pre.astype(jnp.float32)
        t = bd_gt.astype(jnp.float32)
        pos = t == 1
        neg = t == 0
        pos_num = jnp.sum(pos)
        neg_num = jnp.sum(neg)
        total = jnp.maximum(pos_num + neg_num, 1)
        weight = jnp.where(pos, neg_num / total,
                           jnp.where(neg, pos_num / total, 0.0))
        bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
        return self.loss_weight * jnp.mean(weight * bce)


@MODELS.register_module()
class DiceLoss:
    """Dice loss (reference ``dice_loss.py``): softmax/sigmoid probs,
    per-class dice over the batch, mean over classes; ``naive_dice`` uses
    linear instead of squared denominators."""

    def __init__(self, use_sigmoid: bool = True, activate: bool = True,
                 reduction: str = 'mean', naive_dice: bool = False,
                 loss_weight: float = 1.0, ignore_index: int = 255,
                 eps: float = 1e-3, loss_name: str = 'loss_dice'):
        self.use_sigmoid = use_sigmoid
        self.activate = activate
        self.naive_dice = naive_dice
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self.eps = eps
        self.loss_name = loss_name

    def __call__(self, pred, target, weight=None, ignore_index=None, **kw):
        ignore = self.ignore_index if ignore_index is None else ignore_index
        pred = pred.astype(jnp.float32)
        if pred.ndim == 4 and pred.shape[-1] > 1 and not self.use_sigmoid:
            if self.activate:
                pred = jax.nn.softmax(pred, axis=-1)
            num_classes = pred.shape[-1]
            valid = (target != ignore)
            one_hot = jax.nn.one_hot(jnp.where(valid, target, 0), num_classes)
            one_hot = one_hot * valid[..., None]
            pred = pred * valid[..., None]
            dims = tuple(range(1, pred.ndim - 1))  # spatial
            num = 2 * jnp.sum(pred * one_hot, axis=dims)
            if self.naive_dice:
                den = jnp.sum(pred, axis=dims) + jnp.sum(one_hot, axis=dims)
            else:
                den = jnp.sum(pred ** 2, axis=dims) + \
                    jnp.sum(one_hot ** 2, axis=dims)
            dice = (num + self.eps) / (den + self.eps)
            return self.loss_weight * jnp.mean(1 - dice)
        # sigmoid path (1 or C channels: C>1 uses one-hot targets, mmseg-style)
        valid = (target != ignore)
        if pred.ndim == 4 and pred.shape[-1] > 1:
            if self.activate and self.use_sigmoid:
                pred = jax.nn.sigmoid(pred)
            t = jax.nn.one_hot(jnp.where(valid, target, 0), pred.shape[-1])
            t = t * valid[..., None]
            p = pred * valid[..., None]
            dims = tuple(range(1, p.ndim - 1))
            num = 2 * jnp.sum(p * t, axis=dims)
            if self.naive_dice:
                den = jnp.sum(p, axis=dims) + jnp.sum(t, axis=dims)
            else:
                den = jnp.sum(p ** 2, axis=dims) + jnp.sum(t ** 2, axis=dims)
            dice = (num + self.eps) / (den + self.eps)
            return self.loss_weight * jnp.mean(1 - dice)
        if pred.ndim == 4:
            pred = pred[..., 0]
        if self.activate and self.use_sigmoid:
            pred = jax.nn.sigmoid(pred)
        t = jnp.where(valid, target, 0).astype(jnp.float32)
        p = pred * valid
        dims = tuple(range(1, p.ndim))
        num = 2 * jnp.sum(p * t, axis=dims)
        if self.naive_dice:
            den = jnp.sum(p, axis=dims) + jnp.sum(t, axis=dims)
        else:
            den = jnp.sum(p ** 2, axis=dims) + jnp.sum(t ** 2, axis=dims)
        dice = (num + self.eps) / (den + self.eps)
        return self.loss_weight * jnp.mean(1 - dice)


@MODELS.register_module()
class FocalLoss:
    """Sigmoid focal loss (reference ``focal_loss.py`` wrapping the mmcv CUDA
    kernel; identical math in jnp): ``FL = -alpha_t (1-p_t)^gamma log(p_t)``
    one-vs-all over classes, mean over valid pixels."""

    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = 'mean',
                 class_weight=None, loss_weight: float = 1.0,
                 loss_name: str = 'loss_focal'):
        assert use_sigmoid, 'only sigmoid focal loss is supported (as mmcv)'
        self.gamma = gamma
        self.alpha = alpha
        self.loss_weight = loss_weight
        self.class_weight = class_weight
        self.loss_name = loss_name

    def __call__(self, pred, target, weight=None, ignore_index: int = 255,
                 avg_factor=None, **kw):
        num_classes = pred.shape[-1]
        valid = target != ignore_index
        one_hot = jax.nn.one_hot(jnp.where(valid, target, 0), num_classes)
        x = pred.astype(jnp.float32)
        p = jax.nn.sigmoid(x)
        pt = jnp.where(one_hot == 1, p, 1 - p)
        alpha_t = jnp.where(one_hot == 1, self.alpha, 1 - self.alpha)
        bce = jnp.maximum(x, 0) - x * one_hot + jnp.log1p(jnp.exp(-jnp.abs(x)))
        focal = alpha_t * ((1 - pt) ** self.gamma) * bce
        if self.class_weight is not None:
            focal = focal * jnp.asarray(self.class_weight)
        focal = focal * valid[..., None]
        denom = jnp.maximum(jnp.sum(valid), 1)
        return self.loss_weight * jnp.sum(focal) / denom


@MODELS.register_module()
class TverskyLoss:
    """Tversky loss (reference ``tversky_loss.py``): generalized dice with
    FP/FN weights alpha/beta, softmax multi-class."""

    def __init__(self, smooth: float = 1.0, class_weight=None,
                 loss_weight: float = 1.0, ignore_index: int = 255,
                 alpha: float = 0.3, beta: float = 0.7,
                 loss_name: str = 'loss_tversky'):
        self.smooth = smooth
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self.alpha = alpha
        self.beta = beta
        self.loss_name = loss_name

    def __call__(self, pred, target, ignore_index=None, **kw):
        ignore = self.ignore_index if ignore_index is None else ignore_index
        num_classes = pred.shape[-1]
        probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        valid = target != ignore
        one_hot = jax.nn.one_hot(jnp.where(valid, target, 0), num_classes)
        one_hot = one_hot * valid[..., None]
        probs = probs * valid[..., None]
        dims = tuple(range(probs.ndim - 1))
        tp = jnp.sum(probs * one_hot, axis=dims)
        fp = jnp.sum(probs * (1 - one_hot), axis=dims)
        fn = jnp.sum((1 - probs) * one_hot, axis=dims)
        tversky = (tp + self.smooth) / (
            tp + self.alpha * fp + self.beta * fn + self.smooth)
        return self.loss_weight * jnp.mean(1 - tversky)


@MODELS.register_module()
class KLDivLoss:
    """Temperature-scaled KL divergence between logit maps (reference
    ``kldiv_loss.py``)."""

    def __init__(self, temperature: float = 1.0, reduction: str = 'mean',
                 loss_name: str = 'loss_kld', loss_weight: float = 1.0):
        self.temperature = temperature
        self.reduction = reduction
        self.loss_name = loss_name
        self.loss_weight = loss_weight

    def __call__(self, pred, target, **kw):
        logp = jax.nn.log_softmax(pred.astype(jnp.float32) / self.temperature,
                                  axis=-1)
        q = jax.nn.softmax(target.astype(jnp.float32) / self.temperature,
                           axis=-1)
        kl = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-10)) - logp), axis=-1)
        kl = kl * self.temperature ** 2
        if self.reduction == 'none':
            return self.loss_weight * kl
        if self.reduction == 'sum':
            return self.loss_weight * jnp.sum(kl)
        return self.loss_weight * jnp.mean(kl)


@MODELS.register_module()
class SiLogLoss:
    """Scale-invariant log loss for depth (reference ``silog_loss.py``)."""

    def __init__(self, lambd: float = 0.5, eps: float = 1e-6,
                 loss_weight: float = 1.0, loss_name: str = 'loss_silog'):
        self.lambd = lambd
        self.eps = eps
        self.loss_weight = loss_weight
        self.loss_name = loss_name

    def __call__(self, pred, target, **kw):
        if pred.ndim == 4:
            pred = pred[..., 0]
        valid = target > self.eps
        p = jnp.clip(pred.astype(jnp.float32), self.eps)
        t = jnp.clip(target.astype(jnp.float32), self.eps)
        diff = jnp.where(valid, jnp.log(p) - jnp.log(t), 0.0)
        n = jnp.maximum(jnp.sum(valid), 1)
        mse = jnp.sum(diff ** 2) / n
        bias = (jnp.sum(diff) / n) ** 2
        return self.loss_weight * jnp.sqrt(
            jnp.maximum(mse - self.lambd * bias, self.eps))


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    n = gt_sorted.shape[0]
    cum = jnp.cumsum(gt_sorted)
    intersection = gts - cum
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@MODELS.register_module()
class LovaszLoss:
    """Lovasz-softmax loss (reference ``lovasz_loss.py``), ``per_image=False``
    batch flattening, 'present' class filtering."""

    def __init__(self, loss_type: str = 'multi_class', classes='present',
                 per_image: bool = False, reduction: str = 'mean',
                 class_weight=None, loss_weight: float = 1.0,
                 loss_name: str = 'loss_lovasz'):
        self.loss_type = loss_type
        self.classes = classes
        self.loss_weight = loss_weight
        self.class_weight = class_weight
        self.loss_name = loss_name

    def __call__(self, pred, target, ignore_index: int = 255, **kw):
        if self.loss_type == 'binary':
            x = (pred[..., 0] if pred.ndim == 4 else pred).reshape(-1)
            t = target.reshape(-1)
            valid = t != ignore_index
            signs = 2.0 * t.astype(jnp.float32) - 1.0
            errors = jnp.where(valid, 1.0 - x * signs, -jnp.inf)
            order = jnp.argsort(-errors)
            errors_sorted = errors[order]
            gt_sorted = jnp.where(valid, t.astype(jnp.float32), 0.0)[order]
            grad = _lovasz_grad(gt_sorted)
            errors_sorted = jnp.where(jnp.isfinite(errors_sorted),
                                      errors_sorted, 0.0)
            return self.loss_weight * jnp.sum(nn_relu(errors_sorted) * grad)
        # multi-class
        num_classes = pred.shape[-1]
        probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        probs = probs.reshape(-1, num_classes)
        labels = target.reshape(-1)
        valid = labels != ignore_index
        weight_total = []
        losses = []
        for c in range(num_classes):
            fg = ((labels == c) & valid).astype(jnp.float32)
            present = jnp.sum(fg) > 0
            errors = jnp.where(valid, jnp.abs(fg - probs[:, c]), -jnp.inf)
            order = jnp.argsort(-errors)
            errors_sorted = jnp.where(jnp.isfinite(errors[order]),
                                      errors[order], 0.0)
            gt_sorted = fg[order]
            grad = _lovasz_grad(gt_sorted)
            loss_c = jnp.sum(errors_sorted * grad)
            if self.classes == 'present':
                losses.append(jnp.where(present, loss_c, 0.0))
                weight_total.append(present.astype(jnp.float32))
            else:
                losses.append(loss_c)
                weight_total.append(jnp.asarray(1.0))
        total = sum(losses)
        denom = jnp.maximum(sum(weight_total), 1.0)
        return self.loss_weight * total / denom


def nn_relu(x):
    return jnp.maximum(x, 0)


@MODELS.register_module()
class HuasdorffDisstanceLoss:
    """Hausdorff-distance loss (reference ``huasdorff_distance_loss.py``,
    keeping the reference's typo'd registry name): per-class squared softmax
    error weighted by the GT/pred Euclidean distance transforms.

    The distance transforms are computed host-side with scipy (as the
    reference does via a torch<->numpy round trip) under ``pure_callback`` so
    the loss still composes with jit.
    """

    def __init__(self, reduction='mean', class_weight=None, loss_weight=1.0,
                 ignore_index=255, loss_name='loss_huasdorff_disstance'):
        self.loss_weight = loss_weight
        self.class_weight = class_weight
        self.ignore_index = ignore_index
        self.loss_name = loss_name

    @staticmethod
    def _edt_field(one_hot_np):
        from scipy.ndimage import distance_transform_edt
        import numpy as onp
        out = onp.zeros_like(one_hot_np, dtype=onp.float32)
        B, H, W, C = one_hot_np.shape
        for b in range(B):
            for c in range(C):
                fg = one_hot_np[b, :, :, c] > 0.5
                if fg.any():
                    out[b, :, :, c] = (
                        distance_transform_edt(fg) +
                        distance_transform_edt(~fg))
        return out

    def __call__(self, pred, target, ignore_index=None, **kw):
        ignore = self.ignore_index if ignore_index is None else ignore_index
        num_classes = pred.shape[-1]
        probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        valid = target != ignore
        one_hot = jax.nn.one_hot(jnp.where(valid, target, 0), num_classes)
        one_hot = one_hot * valid[..., None]

        field_shape = jax.ShapeDtypeStruct(one_hot.shape, jnp.float32)
        gt_dt = jax.pure_callback(self._edt_field, field_shape, one_hot)
        pred_mask = jax.nn.one_hot(jnp.argmax(probs, -1), num_classes)
        pred_dt = jax.pure_callback(self._edt_field, field_shape, pred_mask)

        err = (probs - one_hot) ** 2
        dist = gt_dt ** 2 + pred_dt ** 2
        loss = err * jax.lax.stop_gradient(dist)
        if self.class_weight is not None:
            loss = loss * jnp.asarray(self.class_weight)
        denom = jnp.maximum(jnp.sum(valid) * num_classes, 1)
        return self.loss_weight * jnp.sum(loss * valid[..., None]) / denom
