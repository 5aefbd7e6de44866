"""Test-time-augmentation merge.

Behavioral spec: reference ``mmseg/models/segmentors/seg_tta.py:15-46``
(``SegTTAModel``): every augmented view is predicted independently, its
logits are resized/unflipped back to the original image frame, per-view
softmax (or sigmoid for the binary path) probabilities are averaged, and the
argmax of the mean is the final prediction.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS


@MODELS.register_module()
class SegTTAModel:
    """Config-compatible marker (``tta_model = dict(type='SegTTAModel')``).

    The functional merge is :func:`merge_tta_probs` — the runner calls it
    with per-view original-frame logits.
    """

    def __init__(self, module=None, **kwargs):
        self.module = module


def merge_tta_probs(view_logits: Sequence[jnp.ndarray],
                    out_channels: Optional[int] = None,
                    threshold: float = 0.3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """view_logits: list of (H, W, C) logits already in the original image
    frame (resized + unflipped). Returns (mean_probs, pred)."""
    probs = []
    for logits in view_logits:
        logits = logits.astype(jnp.float32)
        if (out_channels or logits.shape[-1]) == 1:
            probs.append(jax.nn.sigmoid(logits))
        else:
            probs.append(jax.nn.softmax(logits, axis=-1))
    mean = sum(probs) / len(probs)
    if (out_channels or mean.shape[-1]) == 1:
        pred = (mean[..., 0] > threshold).astype(jnp.int32)
    else:
        pred = jnp.argmax(mean, axis=-1).astype(jnp.int32)
    return mean, pred
