"""MultimodalEncoderDecoder: text + vision open-vocabulary segmentor (SAN).

Behavioral spec: reference
``mmseg/models/segmentors/multimodal_encoder_decoder.py`` — an image
encoder (CLIP visual tower, typically frozen), a text encoder producing
class embeddings from the configured vocabulary, and a decode head (SAN)
consuming ``(image, visual features, class embeddings)``. The text
embeddings are a pure function of config, so under jit they are computed
once per compilation and constant-folded — the reference's runtime caching
falls out of XLA for free.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.registry import MODELS


@MODELS.register_module()
class MultimodalEncoderDecoder(nn.Module):
    image_encoder: Dict
    text_encoder: Dict
    decode_head: Dict
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None
    data_preprocessor: Optional[Dict] = None
    asymetric_input: bool = True
    encoder_resolution: Optional[Any] = None  # scale factor or (h, w)
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    def setup(self):
        self._image_encoder = MODELS.build(dict(self.image_encoder))
        self._text_encoder = MODELS.build(dict(self.text_encoder))
        self._decode_head = MODELS.build(dict(self.decode_head))

    def _encoder_input(self, inputs):
        if not self.asymetric_input or self.encoder_resolution is None:
            return inputs
        from lednet_tpu.ops.resize import resize_bilinear
        res = self.encoder_resolution
        if isinstance(res, (int, float)) and not isinstance(res, bool):
            size = (int(inputs.shape[1] * res), int(inputs.shape[2] * res))
        else:
            size = tuple(res)
        return resize_bilinear(inputs, size, False)

    def extract_feat(self, inputs, train: bool = False):
        return self._image_encoder(self._encoder_input(inputs), train=train)

    def __call__(self, inputs, train: bool = False):
        feats = self.extract_feat(inputs, train=train)
        class_embeds = self._text_encoder()
        return self._decode_head((inputs, feats, class_embeds), train=train)

    def loss(self, inputs, seg_label) -> Dict[str, jnp.ndarray]:
        outs = self(inputs, train=True)
        return {f'decode.{k}': v
                for k, v in self._decode_head.loss_by_feat(
                    outs, seg_label).items()}

    def predict(self, inputs) -> jnp.ndarray:
        outs = self(inputs, train=False)
        return self._decode_head.predict_by_feat(outs, inputs.shape[-3:-1])
