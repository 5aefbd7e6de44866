"""EncoderDecoder segmentor: backbone (+neck) -> decode head (+aux heads).

Behavioral spec from the reference ``mmseg/models/segmentors/encoder_decoder.py``
and ``segmentors/base.py``:

- ``loss``: backbone features -> decode head losses (prefixed ``decode.``)
  plus auxiliary-head losses (``aux``/``aux_k.``) (``encoder_decoder.py:161-185``),
- ``predict``/``whole_inference``: features -> head logits -> full-resolution
  logits (``:294-314``),
- ``slide_inference`` (``:241-292``): overlapping crop grid, per-crop logits
  accumulated into a full-size buffer and normalized by visit counts. The
  reference runs the grid as a sequential python loop on one image; here the
  grid is **static**, all crops are stacked on the batch axis and run through
  ONE forward pass, and the scatter-add is an unrolled static pad-and-sum —
  this batched formulation is the main TPU latency win (SURVEY.md §3.3).

flax note: methods are invoked through ``module.apply(vars, ...,
method='loss'/'predict'/...)``; BatchNorm state lives in the ``batch_stats``
collection (mutable during ``loss``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class EncoderDecoder(nn.Module):
    backbone: Dict
    decode_head: Dict
    neck: Optional[Dict] = None
    auxiliary_head: Optional[Any] = None  # dict or list of dicts
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None
    data_preprocessor: Optional[Dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._decode_head = MODELS.build(dict(self.decode_head))
        self._neck = MODELS.build(dict(self.neck)) if self.neck else None
        aux = self.auxiliary_head
        if aux is None:
            self._aux_heads = []
        elif isinstance(aux, (list, tuple)):
            self._aux_heads = [MODELS.build(dict(c)) for c in aux]
        else:
            self._aux_heads = [MODELS.build(dict(aux))]

    # ---- feature extraction ---------------------------------------------
    def extract_feat(self, inputs, train: bool = False):
        from lednet_tpu.ops.s2d import Packed4x4
        if isinstance(inputs, Packed4x4) and not getattr(
                self._backbone, 'accepts_packed_input', False):
            # the preprocessor's pack_s2d fast path is only understood by
            # backbones with an s2d stem (LEDNet); everyone else gets the
            # plain NHWC image back (exact inverse — ADVICE r4)
            inputs = inputs.unpack()
        feats = self._backbone(inputs, train=train)
        if self._neck is not None:
            feats = self._neck(feats, train=train)
        return feats

    def __call__(self, inputs, train: bool = False):
        """'tensor' mode: raw decode-head outputs (used for init/tracing)."""
        feats = self.extract_feat(inputs, train=train)
        return self._decode_head(feats, train=train)

    # ---- training --------------------------------------------------------
    def loss(self, inputs, seg_label) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(inputs, train=True)
        logits = self._decode_head(feats, train=True)
        losses = {f'decode.{k}': v
                  for k, v in self._decode_head.loss_by_feat(logits, seg_label).items()}
        for i, head in enumerate(self._aux_heads):
            aux_logits = head(feats, train=True)
            prefix = f'aux_{i}' if len(self._aux_heads) > 1 else 'aux'
            for k, v in head.loss_by_feat(aux_logits, seg_label).items():
                losses[f'{prefix}.{k}'] = v
        return losses

    # ---- inference -------------------------------------------------------
    def predict(self, inputs) -> jnp.ndarray:
        """Whole-image inference: logits at (padded) input resolution."""
        from lednet_tpu.ops.s2d import Packed4x4
        if isinstance(inputs, Packed4x4):    # preprocessor fused-pack path
            size = (4 * inputs.data.shape[-3], 4 * inputs.data.shape[-2])
        else:
            size = inputs.shape[-3:-1]
        feats = self.extract_feat(inputs, train=False)
        logits = self._decode_head(feats, train=False, with_aux=False)
        return self._decode_head.predict_by_feat(logits, size)

    def predict_slide(self, inputs) -> jnp.ndarray:
        """Slide inference with a batched crop grid (one forward pass)."""
        from lednet_tpu.ops.s2d import Packed4x4
        if isinstance(inputs, Packed4x4):
            # packed whole-frame input can't be cropped in packed form
            # (crop origins aren't 4-aligned in general) — unpack first
            inputs = inputs.unpack()
        test_cfg = self.test_cfg or {}
        crop_h, crop_w = test_cfg['crop_size']
        stride_h, stride_w = test_cfg['stride']
        B, H, W, _ = inputs.shape
        starts = _slide_grid(H, W, (crop_h, crop_w), (stride_h, stride_w))

        crops = jnp.concatenate(
            [jax.lax.dynamic_slice(inputs, (0, y, x, 0),
                                   (B, crop_h, crop_w, inputs.shape[-1]))
             for (y, x) in starts], axis=0)           # (n_crops*B, ch, cw, 3)
        feats = self.extract_feat(crops, train=False)
        logits = self._decode_head(feats, train=False, with_aux=False)
        crop_logits = self._decode_head.predict_by_feat(logits, (crop_h, crop_w))
        C = crop_logits.shape[-1]
        crop_logits = crop_logits.reshape(len(starts), B, crop_h, crop_w, C)

        accum = jnp.zeros((B, H, W, C), crop_logits.dtype)
        count = jnp.zeros((1, H, W, 1), crop_logits.dtype)
        one = jnp.ones((1, crop_h, crop_w, 1), crop_logits.dtype)
        for i, (y, x) in enumerate(starts):
            accum = jax.lax.dynamic_update_slice(
                accum, jax.lax.dynamic_slice(accum, (0, y, x, 0),
                                             (B, crop_h, crop_w, C))
                + crop_logits[i], (0, y, x, 0))
            count = jax.lax.dynamic_update_slice(
                count, jax.lax.dynamic_slice(count, (0, y, x, 0),
                                             (1, crop_h, crop_w, 1)) + one,
                (0, y, x, 0))
        return accum / count


def _slide_grid(H: int, W: int, crop: Tuple[int, int],
                stride: Tuple[int, int]) -> List[Tuple[int, int]]:
    """Static crop-origin grid, matching the reference's clamped layout
    (``encoder_decoder.py:257-268``)."""
    ch, cw = crop
    sh, sw = stride
    h_grids = max(H - ch + sh - 1, 0) // sh + 1
    w_grids = max(W - cw + sw - 1, 0) // sw + 1
    out = []
    for i in range(h_grids):
        for j in range(w_grids):
            y = min(i * sh, max(H - ch, 0))
            x = min(j * sw, max(W - cw, 0))
            out.append((y, x))
    return out


def postprocess_logits(logits: jnp.ndarray, pad: Tuple[int, int],
                       ori_shape: Optional[Tuple[int, int]] = None,
                       flip: bool = False, flip_direction: str = 'horizontal',
                       align_corners: bool = False,
                       out_channels: Optional[int] = None,
                       threshold: float = 0.3):
    """Reference ``BaseSegmentor.postprocess_result`` (``base.py:127-200``):
    crop padding, un-flip, resize to the original shape, then argmax (or
    sigmoid+threshold for the single-logit binary path). Returns
    (seg_logits, seg_pred)."""
    pad_h, pad_w = pad
    H, W = logits.shape[-3] - pad_h, logits.shape[-2] - pad_w
    logits = logits[:, :H, :W, :]
    if flip:
        axis = -2 if flip_direction == 'horizontal' else -3
        logits = jnp.flip(logits, axis=axis)
    if ori_shape is not None and tuple(ori_shape) != (H, W):
        logits = resize_bilinear(logits, ori_shape, align_corners)
    n_ch = out_channels if out_channels is not None else logits.shape[-1]
    if n_ch == 1:
        pred = (jax.nn.sigmoid(logits[..., 0]) > threshold).astype(jnp.int32)
    else:
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return logits, pred
