"""Depth estimation segmentor.

Behavioral spec: reference ``mmseg/models/segmentors/depth_estimator.py`` —
an EncoderDecoder whose head regresses a 1-channel depth map (SiLog loss);
prediction resizes to the original frame without argmax.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from lednet_tpu.models.segmentors.encoder_decoder import EncoderDecoder
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class DepthEstimator(EncoderDecoder):

    def loss(self, inputs, depth_label) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(inputs, train=True)
        logits = self._decode_head(feats, train=True)
        losses = {f'decode.{k}': v for k, v in
                  self._decode_head.loss_by_feat(logits, depth_label).items()}
        return losses

    def predict(self, inputs) -> jnp.ndarray:
        feats = self.extract_feat(inputs, train=False)
        logits = self._decode_head(feats, train=False, with_aux=False)
        return self._decode_head.predict_by_feat(logits, inputs.shape[-3:-1])
