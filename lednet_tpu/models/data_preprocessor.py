"""On-device batch preprocessing.

Behavioral spec: reference ``mmseg/models/data_preprocessor.py:13-151``
(``SegDataPreProcessor``): uint8 -> float cast, BGR->RGB channel flip,
mean/std normalization, and pad-to-size (images with ``pad_val``, labels with
``seg_pad_val=255``). The reference runs this on GPU per batch; here it is a
pure jnp function fused into the jitted step (the north star asks for
on-device preprocessing), NHWC layout.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS


@MODELS.register_module()
class SegDataPreProcessor:
    def __init__(self,
                 mean: Optional[Sequence[float]] = None,
                 std: Optional[Sequence[float]] = None,
                 size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None,
                 pad_val: float = 0,
                 seg_pad_val: int = 255,
                 bgr_to_rgb: bool = False,
                 rgb_to_bgr: bool = False,
                 batch_augments=None,
                 test_cfg: Optional[Dict] = None,
                 non_blocking: bool = False,
                 out_dtype=None,
                 pack_s2d: bool = False,
                 type: Optional[str] = None):
        # out_dtype (e.g. jnp.bfloat16 or the string 'bfloat16' from a
        # config): emit EVAL images in this dtype so XLA fuses the cast
        # into the normalize pass — a separate convert_element_type of a
        # 720p image costs ~360 us of layout copies on v5e
        # (docs/latency.md).  Training batches stay float32 (reference
        # numerics; AMP casting is the train step's job).
        if isinstance(out_dtype, str):
            out_dtype = jnp.dtype(out_dtype)
        self.out_dtype = out_dtype
        # pack_s2d: eval-only fused normalize+cast+4x4-space-to-depth
        # Pallas kernel emitting a Packed4x4 (BGR channel order preserved;
        # the consumer folds the flip into its first conv weights).  The
        # packed value is only COMPUTED on by backbones that declare
        # ``accepts_packed_input`` (LEDNet's s2d stem); every other
        # consumer (EncoderDecoder.extract_feat for other backbones,
        # predict_slide's crop grid) unpacks it first — exact inverse, so
        # the knob is safe in any config and a no-op off the fast path.
        self.pack_s2d = pack_s2d
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)
        self.size = tuple(size) if size is not None else None
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.channel_flip = bgr_to_rgb or rgb_to_bgr
        self.test_cfg = test_cfg or {}

    def _target_size(self, h: int, w: int, training: bool) -> Tuple[int, int]:
        size = self.size if training else (self.test_cfg.get('size') or self.size
                                           if self.test_cfg else None)
        if training and self.size is not None:
            return max(self.size[0], h), max(self.size[1], w)
        if not training and self.test_cfg.get('size') is not None:
            ts = self.test_cfg['size']
            return max(ts[0], h), max(ts[1], w)
        if self.size_divisor:
            d = self.size_divisor
            return -(-h // d) * d, -(-w // d) * d
        return h, w

    def __call__(self, inputs: jnp.ndarray,
                 seg_label: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """inputs: (B, H, W, 3) uint8/float NHWC (file order: BGR like cv2).

        Returns (normalized+padded images, padded labels or None,
        (pad_h, pad_w)) — pads record how much was added bottom/right so
        postprocessing can crop it back off.
        """
        x = jnp.asarray(inputs).astype(jnp.float32)
        if not training and self.pack_s2d and self.mean is not None \
                and seg_label is None:
            import jax
            from lednet_tpu.ops.pallas.s2d_input import (normalize_s2d,
                                                         s2d_input_fits)
            from lednet_tpu.ops.s2d import Packed4x4
            h, w = x.shape[-3], x.shape[-2]
            th, tw = self._target_size(h, w, training)
            if (jax.default_backend() == 'tpu' and (th, tw) == (h, w)
                    and s2d_input_fits(h, w, x.shape[-1], x.shape[0])):
                mean = self.mean[::-1] if self.channel_flip else self.mean
                std = self.std[::-1] if self.channel_flip else self.std
                packed = normalize_s2d(x, jnp.asarray(mean),
                                       jnp.asarray(std))
                return Packed4x4(packed, bgr=self.channel_flip), None, (0, 0)
        if self.channel_flip:
            x = x[..., ::-1]
        if self.mean is not None:
            x = (x - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        if self.out_dtype is not None and not training:
            x = x.astype(self.out_dtype)
        h, w = x.shape[-3], x.shape[-2]
        th, tw = self._target_size(h, w, training)
        pad_h, pad_w = th - h, tw - w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        constant_values=self.pad_val)
            if isinstance(seg_label, dict):
                padded = {}
                for k, v in seg_label.items():
                    fill = self.seg_pad_val if k == 'gt_seg_map' else 0
                    padded[k] = jnp.pad(v, ((0, 0), (0, pad_h), (0, pad_w)),
                                        constant_values=fill)
                seg_label = padded
            elif seg_label is not None:
                seg_label = jnp.pad(seg_label,
                                    ((0, 0), (0, pad_h), (0, pad_w)),
                                    constant_values=self.seg_pad_val)
        return x, seg_label, (pad_h, pad_w)
