"""Cross-entropy losses (softmax + sigmoid/BCE) with ignore-index handling.

Behavioral spec: reference ``mmseg/models/losses/cross_entropy_loss.py``
(class_weight, avg_non_ignore, sigmoid/softmax paths). Logits are NHWC
``(B, H, W, C)``; labels are ``(B, H, W)`` int32 with ``ignore_index``
sentinel pixels. All reductions are static-shape masked means (no boolean
indexing), so the whole loss jits into the training step.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS


def take_class(values: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """``values[..., C]`` selected at integer ``labels[...]`` -> ``(...)``.

    TPU-native replacement for ``jnp.take_along_axis``: XLA lowers that
    gather to a near-serial loop (measured 30.6 ms for one (8,512,512,2)
    map on v5e — it alone made the train step 123 ms slower); the one-hot
    multiply-sum is pure VPU work at O(C) per pixel. Out-of-range labels
    select 0 (all-zero one-hot row).
    """
    oh = jax.nn.one_hot(labels, values.shape[-1], dtype=values.dtype)
    return jnp.sum(values * oh, axis=-1)


def weight_at(table: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-class weight lookup ``table[labels]`` without a gather."""
    table = jnp.asarray(table, jnp.float32)
    return take_class(jnp.broadcast_to(table, labels.shape + table.shape),
                      labels)


def pixelwise_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                            ignore_index: int = 255,
                            class_weight: Optional[jnp.ndarray] = None):
    """Per-pixel CE and validity mask. Returns (loss[B,H,W], valid[B,H,W])."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -take_class(logp, safe_labels)
    if class_weight is not None:
        nll = nll * weight_at(class_weight, safe_labels)
    return jnp.where(valid, nll, 0.0), valid


@MODELS.register_module()
class CrossEntropyLoss:
    """Softmax or sigmoid cross-entropy (reference ``cross_entropy_loss.py``).

    With ``class_weight`` the normalizer follows torch's weighted-CE
    convention (sum of selected class weights), matching
    ``F.cross_entropy(weight=...)``.
    """

    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = 'mean', class_weight: Optional[Sequence[float]] = None,
                 loss_weight: float = 1.0, loss_name: str = 'loss_ce',
                 avg_non_ignore: bool = False):
        if use_mask:
            raise NotImplementedError('mask CE is not used by the rebuilt model zoo')
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight
        self.loss_name = loss_name
        self.avg_non_ignore = avg_non_ignore

    def __call__(self, logits, labels, weight=None, ignore_index: int = 255,
                 avg_factor=None):
        if self.use_sigmoid:
            return self._binary(logits, labels, weight, ignore_index)
        cw = None if self.class_weight is None else jnp.asarray(self.class_weight)
        pix, valid = pixelwise_cross_entropy(logits, labels, ignore_index, cw)
        if weight is not None:
            pix = pix * weight
        if self.reduction == 'none':
            return self.loss_weight * pix
        if self.reduction == 'sum':
            return self.loss_weight * jnp.sum(pix)
        if avg_factor is not None:
            denom = avg_factor
        elif cw is not None:
            # torch weighted-CE mean: divide by the sum of per-pixel weights
            safe = jnp.where(valid, labels, 0).astype(jnp.int32)
            denom = jnp.sum(jnp.where(valid, weight_at(cw, safe), 0.0))
        elif self.avg_non_ignore:
            denom = jnp.sum(valid)
        else:
            # torch mean over non-ignored counts by default in F.cross_entropy;
            # mmseg passes avg_non_ignore=False meaning divide by all pixels
            denom = labels.size
        return self.loss_weight * jnp.sum(pix) / jnp.maximum(denom, 1)

    def _binary(self, logits, labels, weight, ignore_index):
        valid = (labels != ignore_index)
        x = logits.astype(jnp.float32)
        if logits.ndim == 4 and logits.shape[-1] > 1:
            # mmseg expands int labels to C-channel one-hot for sigmoid CE
            target = jax.nn.one_hot(jnp.where(valid, labels, 0),
                                    logits.shape[-1], dtype=jnp.float32)
            mask = valid[..., None]
            n_elems = labels.size * logits.shape[-1]
        else:
            if logits.ndim == 4:
                x = x[..., 0]
            target = jnp.where(valid, labels, 0).astype(jnp.float32)
            mask = valid
            n_elems = labels.size
        # numerically-stable BCE-with-logits
        loss = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
        loss = jnp.where(mask, loss, 0.0)
        if weight is not None:
            loss = loss * weight
        denom = jnp.sum(mask) if self.avg_non_ignore else n_elems
        return self.loss_weight * jnp.sum(loss) / jnp.maximum(denom, 1)


def _kth_smallest(p_flat: jnp.ndarray, k) -> jnp.ndarray:
    """Exact k-th (0-indexed) order statistic of a NONNEGATIVE f32 vector.

    For nonnegative IEEE floats the bit pattern is monotone in the value, so
    a 32-iteration integer binary search with a count-<= reduction per step
    finds the exact k-th smallest without materializing a ``jnp.sort`` of
    the flattened batch. Measured on the LED train step: same mean cost as
    the sort but markedly lower variance (no 4 MB sorted copy).
    """
    from jax import lax
    bits = lax.bitcast_convert_type(p_flat.astype(jnp.float32), jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2  # (lo+hi)//2 overflows int32 near the top
        take_low = jnp.sum(bits <= mid) >= k + 1
        return (jnp.where(take_low, lo, mid + 1),
                jnp.where(take_low, mid, hi))

    hi0 = lax.bitcast_convert_type(jnp.float32(3.0), jnp.int32)
    lo, _ = lax.fori_loop(0, 32, body, (jnp.int32(0), hi0))
    return lax.bitcast_convert_type(lo, jnp.float32)


@MODELS.register_module()
class OhemCrossEntropy:
    """Online hard example mining CE (PIDNet-style).

    Behavioral spec from the reference ``ohem_cross_entropy_loss.py:52-90``:
    keep valid pixels whose GT-class softmax probability is strictly below
    ``max(kth_smallest_prob, thres)`` where k = ``min(min_kept, n_valid - 1)``;
    the loss is the mean CE over the kept set.

    TPU-native formulation: instead of torch's boolean-indexed sort/filter
    (dynamic shapes), ignored pixels are pushed past any probability (+2.0)
    and the k-th order statistic is found EXACTLY by a 32-step binary search
    on the monotone IEEE bit pattern of the nonnegative f32 values
    (:func:`_kth_smallest`) — 32 masked count-reductions instead of a full
    ``jnp.sort`` of the ~1M-pixel vector; same threshold bit-for-bit.
    """

    def __init__(self, ignore_label: int = 255, thres: float = 0.7,
                 min_kept: int = 100000, loss_weight: float = 1.0,
                 class_weight: Optional[Sequence[float]] = None,
                 loss_name: str = 'loss_ohem'):
        self.ignore_label = ignore_label
        self.thresh = float(thres)
        self.min_kept = max(1, int(min_kept))
        self.loss_weight = loss_weight
        self.class_weight = class_weight
        self.loss_name = loss_name

    def __call__(self, logits, labels, weight=None, ignore_index=None,
                 avg_factor=None):
        ignore = self.ignore_label if ignore_index is None else ignore_index
        cw = None if self.class_weight is None else jnp.asarray(self.class_weight)
        pix, valid = pixelwise_cross_entropy(logits, labels, ignore, cw)

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(valid, labels, 0).astype(jnp.int32)
        p_gt = take_class(probs, safe)
        p_flat = jnp.where(valid, p_gt, 2.0).reshape(-1)

        n_valid = jnp.sum(valid)
        k = jnp.minimum(self.min_kept, jnp.maximum(n_valid - 1, 0))
        min_value = _kth_smallest(p_flat,
                                  jnp.minimum(k, p_flat.shape[0] - 1))
        threshold = jnp.maximum(min_value, self.thresh)

        keep = valid & (p_gt < threshold)
        kept_loss = jnp.sum(jnp.where(keep, pix, 0.0))
        n_kept = jnp.sum(keep)
        mean = jnp.where(n_kept > 0, kept_loss / jnp.maximum(n_kept, 1), 0.0)
        # reference returns 0.0 when there are no valid pixels at all
        return self.loss_weight * jnp.where(n_valid > 0, mean, 0.0)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
             ignore_index: int = 255) -> jnp.ndarray:
    """Top-1 pixel accuracy over non-ignored pixels (reference
    ``mmseg/models/losses/accuracy.py``)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_index
    correct = jnp.sum((pred == labels) & valid)
    return 100.0 * correct / jnp.maximum(jnp.sum(valid), 1)
