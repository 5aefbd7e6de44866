"""OHEM pixel sampler.

Behavioral spec: reference ``mmseg/structures/sampler/ohem_pixel_sampler.py``
— the sampler-based alternative to loss-level OHEM: produce a per-pixel
weight map keeping the hardest pixels, either by probability threshold
(``thresh``: keep pixels whose GT-class prob < thresh, at least ``min_kept``
per image) or by top-k loss.

TPU-native: dynamic boolean indexing becomes a static sort + rank mask.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS


@MODELS.register_module()
class OHEMPixelSampler:
    def __init__(self, context=None, thresh: Optional[float] = None,
                 min_kept: int = 100000, ignore_index: int = 255):
        assert min_kept > 1
        self.thresh = thresh
        self.min_kept = min_kept
        self.ignore_index = ignore_index

    def sample(self, seg_logits: jnp.ndarray, seg_label: jnp.ndarray
               ) -> jnp.ndarray:
        """seg_logits (B,H,W,C), seg_label (B,H,W) -> weights (B,H,W)."""
        B = seg_logits.shape[0]
        batch_kept = self.min_kept * B
        valid = seg_label != self.ignore_index
        safe = jnp.where(valid, seg_label, 0)

        if self.thresh is not None:
            from lednet_tpu.models.losses.cross_entropy import take_class
            probs = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
            p_gt = take_class(probs, safe)
            p_flat = jnp.where(valid, p_gt, 2.0).reshape(-1)
            sorted_p = jnp.sort(p_flat)
            n_valid = jnp.sum(valid)
            k = jnp.clip(batch_kept, 0, jnp.maximum(n_valid - 1, 0))
            min_threshold = sorted_p[jnp.minimum(k, p_flat.size - 1)]
            threshold = jnp.maximum(min_threshold, self.thresh)
            keep = valid & (p_gt < threshold)
        else:
            from lednet_tpu.models.losses.cross_entropy import take_class
            logp = jax.nn.log_softmax(seg_logits.astype(jnp.float32), axis=-1)
            losses = -take_class(logp, safe)
            l_flat = jnp.where(valid, losses, -jnp.inf).reshape(-1)
            # rank by loss descending; keep the top batch_kept valid pixels
            order = jnp.argsort(-l_flat)
            ranks = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.size))
            keep = valid & (ranks.reshape(valid.shape) < batch_kept)
        return keep.astype(seg_logits.dtype)
