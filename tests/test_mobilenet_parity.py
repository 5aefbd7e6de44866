"""Whole-backbone torch parity for the MobileNetV3 segmentation variant
(reference ``mmseg/models/backbones/mobilenet_v3.py``): TF-SAME stem,
InvertedResidual blocks with make_divisible SE squeeze widths, the final
576-channel HSwish conv, and the dense-prediction conversion (layer4/9
stride reset WITHOUT re-enabling their residuals, dilation 2 then 4)."""
import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.backbones.mobilenet import (MobileNetV3,
                                                   make_divisible)

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

SMALL = MobileNetV3.arch_settings['small']


class TMNV3Small(tnn.Module):
    def __init__(self):
        super().__init__()
        m = {}
        m['stem_conv'] = tnn.Conv2d(3, 16, 3, 2, 0, bias=False)
        m['stem_norm'] = tnn.BatchNorm2d(16)
        in_ch = 16
        self.meta = []
        for i, (k, mid, out_ch, se, act, stride) in enumerate(SMALL):
            residual = stride == 1 and in_ch == out_ch
            if i in (3, 8):
                stride = 1
            layer_idx = i + 1
            dil = 4 if layer_idx >= 9 else (2 if layer_idx >= 4 else 1)
            pad = dil * (k - 1) // 2
            if mid != in_ch:
                m[f'b{i}_expand'] = tnn.Conv2d(in_ch, mid, 1, bias=False)
                m[f'b{i}_expand_norm'] = tnn.BatchNorm2d(mid)
            m[f'b{i}_dw'] = tnn.Conv2d(mid, mid, k, stride, pad,
                                       dilation=dil, groups=mid, bias=False)
            m[f'b{i}_dw_norm'] = tnn.BatchNorm2d(mid)
            if se:
                sq = make_divisible(mid // 4, 8)
                m[f'b{i}_se_fc1'] = tnn.Conv2d(mid, sq, 1)
                m[f'b{i}_se_fc2'] = tnn.Conv2d(sq, mid, 1)
            m[f'b{i}_project'] = tnn.Conv2d(mid, out_ch, 1, bias=False)
            m[f'b{i}_project_norm'] = tnn.BatchNorm2d(out_ch)
            self.meta.append((k, mid, out_ch, se, act, residual))
            in_ch = out_ch
        m['final_conv'] = tnn.Conv2d(in_ch, 576, 1, bias=False)
        m['final_norm'] = tnn.BatchNorm2d(576)
        self.mods = tnn.ModuleDict(m)

    def forward(self, x):
        m = self.mods
        x = F.pad(x, (0, 1, 0, 1))  # TF-SAME for even inputs, stride 2 k 3
        x = F.hardswish(m['stem_norm'](m['stem_conv'](x)))
        outs = [x]
        in_ch = 16
        for i, (k, mid, out_ch, se, act, residual) in enumerate(self.meta):
            a = F.hardswish if act == 'HSwish' else F.relu
            identity = x
            h = x
            if f'b{i}_expand' in m:
                h = a(m[f'b{i}_expand_norm'](m[f'b{i}_expand'](h)))
            h = a(m[f'b{i}_dw_norm'](m[f'b{i}_dw'](h)))
            if se:
                g = h.mean((2, 3), keepdim=True)
                g = F.relu(m[f'b{i}_se_fc1'](g))
                g = torch.clamp(m[f'b{i}_se_fc2'](g) / 6.0 + 0.5, 0, 1)
                h = h * g
            h = m[f'b{i}_project_norm'](m[f'b{i}_project'](h))
            if residual:
                h = h + identity
            x = h
            in_ch = out_ch
            outs.append(x)
        outs.append(F.hardswish(m['final_norm'](m['final_conv'](x))))
        return outs


def _copy_conv(dst, p):
    with torch.no_grad():
        dst.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['kernel']), (3, 2, 0, 1)).copy()))
        if dst.bias is not None:
            dst.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))


def _copy_bn(dst, p, s):
    with torch.no_grad():
        dst.weight.copy_(torch.from_numpy(np.asarray(p['scale']).copy()))
        dst.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))
        dst.running_mean.copy_(torch.from_numpy(np.asarray(s['mean']).copy()))
        dst.running_var.copy_(torch.from_numpy(np.asarray(s['var']).copy()))


def test_mobilenet_v3_small_full_parity(rng):
    model = MobileNetV3(arch='small',
                        out_indices=tuple(range(13)))
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    outs_j = model.apply(variables, jnp.asarray(x), train=False)

    t = TMNV3Small()
    p, s = jax.device_get(variables['params']), \
        jax.device_get(variables['batch_stats'])
    for name, mod in t.mods.items():
        if isinstance(mod, tnn.BatchNorm2d):
            if name == 'final_norm':  # lives inside the final ConvModule
                _copy_bn(mod, p['final_conv']['norm']['bn'],
                         s['final_conv']['norm']['bn'])
                continue
            src = name[:-5] if name.endswith('_norm') else name
            if src in p:  # ConvModule norm lives under the conv module name
                _copy_bn(mod, p[src]['norm']['bn'], s[src]['norm']['bn'])
            else:
                _copy_bn(mod, p[name]['bn'], s[name]['bn'])
        elif name.endswith(('_fc1', '_fc2')):
            base, fc = name.rsplit('_', 1)
            _copy_conv(mod, p[base][fc])
        elif name == 'stem_conv':
            _copy_conv(mod, p[name])
        else:
            _copy_conv(mod, p[name]['conv'])
    t.eval()
    with torch.no_grad():
        outs_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(outs_j) == len(outs_t) == 13
    # conversion facts: final channels 576, os=8 everywhere past block 1
    assert outs_j[-1].shape[-1] == 576
    assert outs_j[-1].shape[1:3] == (8, 12)
    for i, (oj, ot) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(oj), ot.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=2e-4, err_msg=f'layer {i}')


class TMNV2(tnn.Module):
    """Torch mirror of the reference MobileNetV2 seg variant
    (``mmseg/models/backbones/mobilenet_v2.py``): ConvModule stem
    (3x3 s2 p1 + BN + ReLU6), 7 inverted-residual stages where stride
    AND dilation apply to the FIRST block of a stage only
    (``mobilenet_v2.py:149-157``)."""

    ARCH = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4),
            (6, 96, 3), (6, 160, 3), (6, 320, 1)]

    def __init__(self, strides, dilations):
        super().__init__()
        m = {}
        m['conv1'] = tnn.Conv2d(3, 32, 3, 2, 1, bias=False)
        m['conv1_norm'] = tnn.BatchNorm2d(32)
        in_ch = 32
        self.meta = []
        for i, (t, c, n) in enumerate(self.ARCH):
            for j in range(n):
                stride = strides[i] if j == 0 else 1
                dil = dilations[i] if j == 0 else 1
                mid = in_ch * t
                name = f'l{i}_{j}'
                if t != 1:
                    m[name + '_expand'] = tnn.Conv2d(in_ch, mid, 1, bias=False)
                    m[name + '_expand_norm'] = tnn.BatchNorm2d(mid)
                m[name + '_dw'] = tnn.Conv2d(mid, mid, 3, stride, dil,
                                             dilation=dil, groups=mid,
                                             bias=False)
                m[name + '_dw_norm'] = tnn.BatchNorm2d(mid)
                m[name + '_project'] = tnn.Conv2d(mid, c, 1, bias=False)
                m[name + '_project_norm'] = tnn.BatchNorm2d(c)
                self.meta.append((name, stride == 1 and in_ch == c))
                in_ch = c
        self.mods = tnn.ModuleDict(m)

    def forward(self, x):
        m = self.mods
        x = F.relu6(m['conv1_norm'](m['conv1'](x)))
        outs, k = [], 0
        for i, (t, c, n) in enumerate(self.ARCH):
            for j in range(n):
                name, residual = self.meta[k]
                k += 1
                h = x
                if name + '_expand' in m:
                    h = F.relu6(m[name + '_expand_norm'](m[name + '_expand'](h)))
                h = F.relu6(m[name + '_dw_norm'](m[name + '_dw'](h)))
                h = m[name + '_project_norm'](m[name + '_project'](h))
                x = x + h if residual else h
            outs.append(x)
        return outs


def test_mobilenet_v2_dilated_full_parity(rng):
    # deeplab-style os=8 variant: stride reset + dilated stages 4-7 —
    # exercises the first-block-only dilation semantics
    from lednet_tpu.models.backbones.mobilenet import MobileNetV2
    strides = (1, 2, 2, 1, 1, 1, 1)
    dilations = (1, 1, 1, 2, 2, 4, 4)
    model = MobileNetV2(strides=strides, dilations=dilations,
                        out_indices=tuple(range(7)))
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    outs_j = model.apply(variables, jnp.asarray(x), train=False)

    t = TMNV2(strides, dilations)
    p, s = jax.device_get(variables['params']), \
        jax.device_get(variables['batch_stats'])

    def unit(name):
        # torch mirror name l{i}_{j}_{part} -> flax layer{i+1}_{j}/{part}
        stage, blk, part = name.split('_', 2)
        return p[f'layer{int(stage[1:]) + 1}_{blk}'][part], \
            s[f'layer{int(stage[1:]) + 1}_{blk}'][part]

    for name, mod in t.mods.items():
        if name == 'conv1':
            _copy_conv(mod, p['conv1']['conv'])
        elif name == 'conv1_norm':
            _copy_bn(mod, p['conv1']['norm']['bn'], s['conv1']['norm']['bn'])
        elif name.endswith('_norm'):
            pp, ss = unit(name[:-5])
            _copy_bn(mod, pp['norm']['bn'], ss['norm']['bn'])
        else:
            pp, _ = unit(name)
            _copy_conv(mod, pp['conv'])
    t.eval()
    with torch.no_grad():
        outs_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(outs_j) == len(outs_t) == 7
    # os=8 facts: stages 4-7 keep the 8x12 grid, dilation carries context
    assert outs_j[-1].shape[1:3] == (8, 12)
    assert outs_j[-1].shape[-1] == 320
    for i, (oj, ot) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(oj), ot.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=2e-4, err_msg=f'stage {i}')
