"""VPD depth-prediction head.

Behavioral spec: reference ``mmseg/models/decode_heads/vpd_depth_head.py``
(``VPDDepthDecoder`` :17-96, ``VPDDepthHead`` :100-253) — aggregate the four
multi-scale feature maps to a common 1/16-scale grid, 1x1-project to
``feature_dim``, decode through ``num_deconv_layers`` stride-2 transposed
convs plus two bilinear 2x upsamples, and regress ``sigmoid(out) * max_depth``.
The reference's VPD *backbone* needs latent-diffusion weights (gated here),
but this head is plain convs and pairs with any 4-scale backbone.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import Norm2d, kaiming_init
from lednet_tpu.ops.resize import resize_bilinear, resize_nearest
from lednet_tpu.registry import MODELS


class VPDDepthDecoder(nn.Module):
    """Deconv decoder (reference ``vpd_depth_head.py:17-96``)."""
    out_channels: int
    num_deconv_layers: int = 3
    num_deconv_filters: Sequence[int] = (32, 32, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_deconv_layers):
            x = nn.ConvTranspose(self.num_deconv_filters[i], (2, 2),
                                 strides=(2, 2), use_bias=False,
                                 kernel_init=kaiming_init,
                                 name=f'deconv{i}')(x)
            x = Norm2d(dict(type='BN'), name=f'deconv_bn{i}')(x, train=train)
            x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=kaiming_init, name='conv_out')(x)
        x = Norm2d(dict(type='BN'), name='conv_out_bn')(x, train=train)
        x = nn.relu(x)
        # reference applies nn.Upsample(scale_factor=2, bilinear) twice (:69-70)
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear(x, (h * 2, w * 2), align_corners=False)
        x = resize_bilinear(x, (h * 4, w * 4), align_corners=False)
        return x


@MODELS.register_module()
class VPDDepthHead(nn.Module):
    """Depth head regressing ``sigmoid(logits) * max_depth``
    (reference ``vpd_depth_head.py:100-216``)."""
    max_depth: float = 10.0
    in_channels: Sequence[int] = (320, 640, 1280, 1280)
    embed_dim: int = 192
    feature_dim: int = 1536
    num_deconv_layers: int = 3
    num_deconv_filters: Sequence[int] = (32, 32, 32)
    fmap_border: Union[int, Tuple[int, int]] = 0
    align_corners: bool = False
    loss_decode: Optional[Dict] = None

    num_classes: int = 1
    out_channels: int = 1

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        x0, x1, x2, x3 = inputs
        # reference forward (:201-216): x3 nearest-up 2x, concat onto x2
        x3 = resize_nearest(x3, (x3.shape[-3] * 2, x3.shape[-2] * 2))
        x2 = jnp.concatenate([x2, x3], axis=-1)

        # conv1: two stride-2 convs with a GN+ReLU between (:157-162)
        c1 = nn.Conv(self.in_channels[0], (3, 3), strides=(2, 2), padding=1,
                     kernel_init=kaiming_init, name='conv1_a')(x0)
        c1 = Norm2d(dict(type='GN', num_groups=16), name='conv1_gn')(c1)
        c1 = nn.relu(c1)
        c1 = nn.Conv(self.in_channels[0], (3, 3), strides=(2, 2), padding=1,
                     kernel_init=kaiming_init, name='conv1_b')(c1)
        # conv2: one stride-2 conv (:163-164)
        c2 = nn.Conv(self.in_channels[1], (3, 3), strides=(2, 2), padding=1,
                     kernel_init=kaiming_init, name='conv2')(x1)

        x = jnp.concatenate([c1, c2, x2], axis=-1)
        x = nn.Conv(self.feature_dim, (1, 1), kernel_init=kaiming_init,
                    name='conv_aggregation')(x)
        x = Norm2d(dict(type='GN', num_groups=16), name='agg_gn')(x)
        x = nn.relu(x)

        fb = self.fmap_border
        fb = (fb, fb) if isinstance(fb, int) else tuple(fb)
        if fb[0] or fb[1]:
            x = x[:, :x.shape[-3] - fb[0], :x.shape[-2] - fb[1], :]

        x = VPDDepthDecoder(out_channels=self.embed_dim,
                            num_deconv_layers=self.num_deconv_layers,
                            num_deconv_filters=self.num_deconv_filters,
                            name='decoder')(x, train=train)

        out = nn.Conv(self.embed_dim, (3, 3), padding=1,
                      kernel_init=kaiming_init, name='pred_a')(x)
        out = nn.relu(out)
        out = nn.Conv(1, (3, 3), padding=1, kernel_init=kaiming_init,
                      name='pred_b')(out)
        return nn.sigmoid(out) * self.max_depth

    def loss_by_feat(self, pred_depth, depth_label) -> Dict[str, jnp.ndarray]:
        """Reference ``loss_by_feat`` (:218-253): resize prediction to the GT
        map, run the (possibly multiple) depth losses accumulating by name."""
        from lednet_tpu.models.decode_heads.base import build_losses
        if isinstance(depth_label, dict):
            depth_label = depth_label['gt_depth_map']
        losses = build_losses(self.loss_decode or dict(type='SiLogLoss'))
        pred_depth = resize_bilinear(pred_depth, depth_label.shape[1:3],
                                     self.align_corners)
        out: Dict[str, jnp.ndarray] = {}
        for loss_fn in losses:
            name = loss_fn.loss_name
            out[name] = out.get(name, 0.0) + loss_fn(pred_depth, depth_label)
        return out

    def predict_by_feat(self, depth, size=None):
        if size is None:
            return depth
        return resize_bilinear(depth, size, self.align_corners)
