"""CARAFE content-aware upsampling.

Behavioral spec: reference ``tools/speed/model_utils_speed.py:610``
(``CARAFE``: channel-compress -> predict per-pixel (up^2 * k^2) reassembly
kernels -> pixel-shuffle to the upsampled grid -> softmax-normalize -> apply
each kernel over the source neighborhood).

jnp formulation: neighborhoods via ``conv_general_dilated_patches``, kernel
application as one einsum — no CUDA op needed.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, kaiming_init
from lednet_tpu.registry import MODELS


def carafe_reassemble(x: jnp.ndarray, kernels: jnp.ndarray, up: int,
                      k: int) -> jnp.ndarray:
    """x (B,H,W,C); kernels (B, H*up, W*up, k*k) softmax-normalized.
    Output (B, H*up, W*up, C)."""
    B, H, W, C = x.shape
    # neighborhoods of the source grid: (B, H, W, C*k*k)
    patches = jax.lax.conv_general_dilated_patches(
        x, (k, k), (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    patches = patches.reshape(B, H, W, C, k * k)
    # each upsampled pixel (uy, ux) reads the source pixel's neighborhood
    patches = jnp.repeat(jnp.repeat(patches, up, axis=1), up, axis=2)
    return jnp.einsum('bhwck,bhwk->bhwc', patches, kernels)


@MODELS.register_module()
class CARAFE(nn.Module):
    """Upsampler module: ``CARAFE(inC, outC, kernel_size, up_factor)``."""
    inC: int
    outC: int
    kernel_size: int = 3
    up_factor: int = 2
    cp_rate: int = 4
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, up = self.kernel_size, self.up_factor
        # reference: plain 1x1 compressor, no norm/act (model_utils_speed.py:617)
        comp = ConvModule(self.inC, max(self.inC // self.cp_rate, 1), 1,
                          norm_cfg=None, act_cfg=None,
                          name='comp')(x, train=train)
        # predict up^2 * k^2 kernels per source pixel; channel layout is
        # kernel-major (kk * up^2 + i*up + j) so torch pixel_shuffle-trained
        # encoder weights transplant unchanged (model_utils_speed.py:628)
        kern = nn.Conv(up * up * k * k, (k, k),
                       padding=((k // 2,) * 2, (k // 2,) * 2),
                       kernel_init=kaiming_init, name='content')(comp)
        B, H, W, _ = kern.shape
        kern = kern.reshape(B, H, W, k * k, up, up)
        kern = kern.transpose(0, 1, 4, 2, 5, 3).reshape(B, H * up, W * up,
                                                        k * k)
        kern = nn.softmax(kern.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = carafe_reassemble(x, kern, up, k)
        # reference applies the 1x1 out conv unconditionally; norm_cfg is
        # the ``ifBN`` analogue and is honored as given (:620,650)
        out = ConvModule(self.inC, self.outC, 1, norm_cfg=self.norm_cfg,
                         act_cfg=None, name='out_proj')(out, train=train)
        return out
