"""LightHamHead — SegNeXt's Hamburger decode head.

Behavioral spec: reference ``mmseg/models/decode_heads/ham_head.py``: the
selected multi-level features are resized to the finest and concatenated,
squeezed to ``ham_channels``, passed through the Hamburger module (NMF-based
matrix decomposition: D ~= B @ C with multiplicative-update iterations over
the flattened spatial axis), then aligned to ``channels`` and classified.

TPU notes: the NMF inner loop is a fixed-iteration ``lax.fori_loop`` of
batched matmuls (R x N and C x R) — static shapes, MXU-friendly; the
reference's train-time extra iterations and random bases init are preserved
(eval uses a deterministic uniform init so inference is jittable/cacheable).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.models.decode_heads.base import ClsSeg, select_inputs
from lednet_tpu.models.decode_heads.psp_aspp import _HeadBase
from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


def _nmf(x, rank: int, steps: int, key=None, inv_t: float = 1.0,
         bases0=None):
    """Multiplicative-update NMF: x (B, C, N) >= 0 -> recon (B, C, N).

    Mirrors reference ``ham_head.py`` ``NMF2D``/``Matrix_Decomposition_2D_
    Base`` (``:62-155``): softmax(inv_t * x^T bases) initial coefficient
    (NMF2D sets ``inv_t=1``, ``:118`` — NOT the base-class 100), ``steps``
    MU iterations, a final coefficient-only update, then reconstruction.
    Bases init is L2-normalized over C (``_build_bases:120-126``); eval
    uses a deterministic uniform vector instead of ``torch.rand`` so
    inference is jittable and cacheable (documented divergence; the
    reference re-randomizes every forward, even in eval)."""
    B, C, N = x.shape
    if bases0 is not None:
        bases = bases0
    else:
        if key is None:
            bases = jnp.ones((B, C, rank), x.dtype)
        else:
            bases = jax.random.uniform(key, (B, C, rank), x.dtype)
        bases = bases / jnp.sqrt(
            jnp.sum(bases ** 2, axis=1, keepdims=True) + 1e-12)

    def step(_, carry):
        bases, coef = carry
        # coef: (B, N, R)
        numer = jnp.einsum('bcn,bcr->bnr', x, bases)
        denom = jnp.einsum('bnr,bcr,bcs->bns', coef, bases, bases)
        coef = coef * numer / (denom + 1e-6)
        numer = jnp.einsum('bcn,bnr->bcr', x, coef)
        denom = jnp.einsum('bcr,bnr,bns->bcs', bases, coef, coef)
        bases = bases * numer / (denom + 1e-6)
        return bases, coef

    coef = jnp.einsum('bcn,bcr->bnr', x, bases)
    coef = nn.softmax(inv_t * coef, axis=-1)
    bases, coef = jax.lax.fori_loop(0, steps, step, (bases, coef))
    # final coefficient solve + reconstruction
    numer = jnp.einsum('bcn,bcr->bnr', x, bases)
    denom = jnp.einsum('bnr,bcr,bcs->bns', coef, bases, bases)
    coef = coef * numer / (denom + 1e-6)
    return jnp.einsum('bcr,bnr->bcn', bases, coef)


class Hamburger(nn.Module):
    ham_channels: int = 512
    md_s: int = 1
    md_r: int = 64
    train_steps: int = 6
    eval_steps: int = 7
    rand_init: bool = True
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # lower bread: 1x1 conv, no norm/act -> conv bias=True (mmcv
        # ConvModule enables bias exactly when there is no following norm)
        h = nn.Conv(self.ham_channels, (1, 1), use_bias=True,
                    name='ham_in')(x)
        B, H, W, C = h.shape
        h = nn.relu(h)
        # (B, H, W, C) -> (B*S, D, N) as in the reference forward (:77-90)
        flat = h.reshape(B, H * W, C).transpose(0, 2, 1)  # (B, C, N)
        if self.md_s > 1:
            flat = flat.reshape(B * self.md_s, C // self.md_s, H * W)
        steps = self.train_steps if train else self.eval_steps
        key = self.make_rng('nmf') if (self.rand_init and train and
                                       self.has_rng('nmf')) else None
        recon = _nmf(flat, self.md_r, steps, key=key)
        if self.md_s > 1:
            recon = recon.reshape(B, C, H * W)
        h = recon.transpose(0, 2, 1).reshape(B, H, W, C)
        # upper bread with the head's norm (GN in SegNeXt), residual + relu
        h = ConvModule(self.ham_channels, self.ham_channels, 1,
                       norm_cfg=self.norm_cfg or dict(type='GN',
                                                      num_groups=32),
                       act_cfg=None, name='ham_out')(h, train=train)
        return nn.relu(x + h)


@MODELS.register_module()
class LightHamHead(_HeadBase):
    ham_channels: int = 512
    ham_kwargs: Optional[Dict] = None
    in_index: Sequence[int] = (1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='GN', num_groups=32)
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = select_inputs(inputs, self.in_index, 'multiple_select',
                           self.align_corners)
        size = xs[0].shape[-3:-1]
        xs = [resize_bilinear(x, size, self.align_corners) for x in xs]
        x = jnp.concatenate(xs, axis=-1)
        x = ConvModule(x.shape[-1], self.ham_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='squeeze')(x, train=train)
        kwargs = dict(self.ham_kwargs or {})
        x = Hamburger(self.ham_channels,
                      md_s=kwargs.get('MD_S', 1),
                      md_r=kwargs.get('MD_R', 64),
                      train_steps=kwargs.get('train_steps', 6),
                      eval_steps=kwargs.get('eval_steps', 7),
                      rand_init=kwargs.get('rand_init', True),
                      norm_cfg=norm_cfg,
                      name='hamburger')(x, train=train)
        x = ConvModule(self.ham_channels, self.channels, 1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='align')(x, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(x, train=train)
