"""Cascade encoder-decoder (OCR/PointRend-style chained heads).

Behavioral spec: reference ``mmseg/models/segmentors/cascade_encoder_decoder.py``:
``num_stages`` decode heads where head k >= 1 receives (features,
previous-stage output); losses are prefixed ``decode_k``; prediction uses the
last head's output. Cascade heads take ``prev_output`` as a second argument.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.segmentors.encoder_decoder import EncoderDecoder
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class CascadeEncoderDecoder(EncoderDecoder):
    num_stages: int = 2

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._neck = MODELS.build(dict(self.neck)) if self.neck else None
        assert isinstance(self.decode_head, (list, tuple)) and \
            len(self.decode_head) == self.num_stages
        self._heads = [MODELS.build(dict(c)) for c in self.decode_head]
        self._decode_head = self._heads[-1]
        aux = self.auxiliary_head
        if aux is None:
            self._aux_heads = []
        elif isinstance(aux, (list, tuple)):
            self._aux_heads = [MODELS.build(dict(c)) for c in aux]
        else:
            self._aux_heads = [MODELS.build(dict(aux))]

    def _cascade_forward(self, feats, train: bool):
        out = self._heads[0](feats, train=train)
        outs = [out]
        for head in self._heads[1:]:
            out = head(feats, out, train=train)
            outs.append(out)
        return outs

    def __call__(self, inputs, train: bool = False):
        feats = self.extract_feat(inputs, train=train)
        return self._cascade_forward(feats, train)[-1]

    def loss(self, inputs, seg_label) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(inputs, train=True)
        outs = self._cascade_forward(feats, train=True)
        losses = {}
        for i, (head, out) in enumerate(zip(self._heads, outs)):
            for k, v in head.loss_by_feat(out, seg_label).items():
                losses[f'decode_{i}.{k}'] = v
        for i, head in enumerate(self._aux_heads):
            aux_out = head(feats, train=True)
            prefix = f'aux_{i}' if len(self._aux_heads) > 1 else 'aux'
            for k, v in head.loss_by_feat(aux_out, seg_label).items():
                losses[f'{prefix}.{k}'] = v
        return losses

    def predict(self, inputs) -> jnp.ndarray:
        feats = self.extract_feat(inputs, train=False)
        out = self._cascade_forward(feats, train=False)[-1]
        return self._decode_head.predict_by_feat(out, inputs.shape[-3:-1])
