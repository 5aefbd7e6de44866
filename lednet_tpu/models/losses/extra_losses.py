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


def _weight_reduce(loss, weight=None, reduction='mean', avg_factor=None):
    """mmengine ``weight_reduce_loss`` semantics on a per-sample vector."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == 'mean':
            return jnp.mean(loss)
        if reduction == 'sum':
            return jnp.sum(loss)
        return loss
    if reduction == 'mean':
        return jnp.sum(loss) / avg_factor
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


@MODELS.register_module()
class DiceLoss:
    """Dice loss, exact reference semantics (``dice_loss.py:32-92,142-188``):

    - label maps are expanded by clamp-to-[0, C] one-hot with the overflow
      column dropped, so ignore-index pixels get an all-zero target row while
      their *predictions still count* in the denominators (the reference's
      ``ignore_index`` removes a class CHANNEL, a no-op for the usual 255);
    - for single-channel preds this expansion yields the class-0 indicator
      (i.e. the background map) — reproduced faithfully;
    - activation: sigmoid if ``use_sigmoid`` else softmax only when C > 1;
    - dice is computed per SAMPLE over the flattened (C·H·W) vector, giving
      (N,) losses; eps placement differs between the naive and V-Net forms.
    """

    def __init__(self, use_sigmoid: bool = True, activate: bool = True,
                 reduction: str = 'mean', naive_dice: bool = False,
                 loss_weight: float = 1.0, ignore_index: int = 255,
                 eps: float = 1e-3, loss_name: str = 'loss_dice'):
        self.use_sigmoid = use_sigmoid
        self.activate = activate
        self.reduction = reduction
        self.naive_dice = naive_dice
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self.eps = eps
        self.loss_name = loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        reduction = reduction_override or self.reduction
        pred = pred.astype(jnp.float32)
        one_hot = target
        if pred.shape != target.shape:
            num_classes = pred.shape[-1]
            clamped = jnp.clip(target, 0, num_classes)
            one_hot = jax.nn.one_hot(clamped, num_classes + 1)[..., :num_classes]
        if self.activate:
            if self.use_sigmoid:
                pred = jax.nn.sigmoid(pred)
            elif pred.shape[-1] != 1:
                pred = jax.nn.softmax(pred, axis=-1)
        if self.ignore_index is not None and pred.ndim >= 2 and \
                self.ignore_index < pred.shape[-1]:
            keep = [c for c in range(pred.shape[-1]) if c != self.ignore_index]
            pred = pred[..., keep]
            one_hot = one_hot[..., keep]
        p = pred.reshape(pred.shape[0], -1)
        t = one_hot.reshape(one_hot.shape[0], -1).astype(jnp.float32)
        a = jnp.sum(p * t, axis=1)
        if self.naive_dice:
            b = jnp.sum(p, axis=1)
            c = jnp.sum(t, axis=1)
            d = (2 * a + self.eps) / (b + c + self.eps)
        else:
            b = jnp.sum(p * p, axis=1) + self.eps
            c = jnp.sum(t * t, axis=1) + self.eps
            d = (2 * a) / (b + c)
        loss = _weight_reduce(1 - d, weight, reduction, avg_factor)
        return self.loss_weight * loss


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
        self.class_weight = class_weight
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self.alpha = alpha
        self.beta = beta
        self.loss_name = loss_name

    def __call__(self, pred, target, ignore_index=None, **kw):
        ignore = self.ignore_index if ignore_index is None else ignore_index
        num_classes = pred.shape[-1]
        probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        # reference ``tversky_loss.py:106-112``: clamp-based one-hot (ignore
        # pixels are masked by valid_mask in every term, so the clamp value
        # never leaks), per-class per-SAMPLE ratios, mean over samples, sum
        # over classes / num_classes.
        one_hot = jax.nn.one_hot(jnp.clip(target, 0, num_classes - 1),
                                 num_classes)
        valid = (target != ignore).astype(jnp.float32)
        B = probs.shape[0]
        p = probs.reshape(B, -1, num_classes)
        t = one_hot.reshape(B, -1, num_classes)
        v = valid.reshape(B, -1, 1)
        tp = jnp.sum(p * t * v, axis=1)
        fp = jnp.sum(p * (1 - t) * v, axis=1)
        fn = jnp.sum((1 - p) * t * v, axis=1)
        tversky = (tp + self.smooth) / (
            tp + self.alpha * fp + self.beta * fn + self.smooth)  # (B, C)
        per_class = jnp.mean(1 - tversky, axis=0)  # mean over samples
        if self.class_weight is not None:
            per_class = per_class * jnp.asarray(self.class_weight)
        if 0 <= ignore < num_classes:
            per_class = per_class * (jnp.arange(num_classes) != ignore)
        return self.loss_weight * jnp.sum(per_class) / num_classes


@MODELS.register_module()
class KLDivLoss:
    """Temperature-scaled KL divergence between logit maps, exact reference
    behavior (``kldiv_loss.py:41-86``).

    Note the reference feeds *probabilities* (``F.softmax``) into
    ``F.kl_div``, whose pointwise form is ``q * (log q - input)`` and expects
    log-probabilities — so its value is ``q*(log q - p)``, NOT the textbook
    KL. We reproduce that behavior for parity. Reductions are per-sample:
    'mean'/'sum' return an (N,) vector (mmengine's parse_losses means it)."""

    def __init__(self, temperature: float = 1.0, reduction: str = 'mean',
                 loss_name: str = 'loss_kld', loss_weight: float = 1.0):
        self.temperature = temperature
        self.reduction = reduction
        self.loss_name = loss_name
        self.loss_weight = loss_weight

    def __call__(self, pred, target, **kw):
        p = jax.nn.softmax(pred.astype(jnp.float32) / self.temperature,
                           axis=-1)
        q = jax.nn.softmax(target.astype(jnp.float32) / self.temperature,
                           axis=-1)
        # torch F.kl_div(input=p, target=q): q*log(q) - q*p, with the
        # q*log(q) term defined as 0 at q == 0 (xlogy semantics)
        kl = jnp.where(q > 0, q * jnp.log(jnp.clip(q, 1e-38)), 0.0) - q * p
        kl = kl * self.temperature ** 2
        B = kl.shape[0]
        if self.reduction == 'sum':
            return self.loss_weight * jnp.sum(kl.reshape(B, -1), axis=1)
        if self.reduction == 'mean':
            return self.loss_weight * jnp.mean(kl.reshape(B, -1), axis=1)
        return self.loss_weight * kl


@MODELS.register_module()
class SiLogLoss:
    """Scale-invariant log loss for depth (reference ``silog_loss.py``)."""

    def __init__(self, lambd: float = 0.5, eps: float = 1e-6,
                 loss_weight: float = 1.0, loss_name: str = 'loss_silog'):
        self.lambd = lambd
        self.eps = eps
        self.loss_weight = loss_weight
        self.loss_name = loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        # reference ``silog_loss.py:12-56``: per-SAMPLE flatten, per-sample
        # valid-masked means (denominator clamped at eps, not 1), sqrt per
        # sample, then weight_reduce over the batch.
        if pred.ndim == 4:
            pred = pred[..., 0]
        B = pred.shape[0]
        p = pred.astype(jnp.float32).reshape(B, -1)
        t = target.astype(jnp.float32).reshape(B, -1)
        diff = jnp.log(jnp.clip(t, self.eps)) - jnp.log(jnp.clip(p, self.eps))
        valid = ((t > self.eps) & jnp.isfinite(diff)).astype(jnp.float32)
        diff = jnp.where(valid > 0, diff, 0.0)
        n = jnp.clip(jnp.sum(valid, axis=1), self.eps)
        sq_mean = jnp.sum(diff ** 2 * valid, axis=1) / n
        mean = jnp.sum(diff * valid, axis=1) / n
        loss = jnp.sqrt(jnp.maximum(sq_mean - self.lambd * mean ** 2, 0.0))
        reduction = reduction_override or 'mean'
        return self.loss_weight * _weight_reduce(loss, weight, reduction,
                                                 avg_factor)


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
        class_to_sum = (list(range(num_classes))
                        if self.classes in ('all', 'present')
                        else list(self.classes))
        for c in class_to_sum:
            fg = ((labels == c) & valid).astype(jnp.float32)
            present = jnp.sum(fg) > 0
            errors = jnp.where(valid, jnp.abs(fg - probs[:, c]), -jnp.inf)
            order = jnp.argsort(-errors)
            errors_sorted = jnp.where(jnp.isfinite(errors[order]),
                                      errors[order], 0.0)
            gt_sorted = fg[order]
            grad = _lovasz_grad(gt_sorted)
            loss_c = jnp.sum(errors_sorted * grad)
            if self.class_weight is not None:
                loss_c = loss_c * self.class_weight[c]
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
