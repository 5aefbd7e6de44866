"""Whole-backbone numeric parity: flax HRNet vs a torch implementation of
the reference semantics (``mmseg/models/backbones/hrnet.py``): Bottleneck
(expansion 4) stage-1, per-stage transitions, BasicBlock branches, and the
repeated cross-resolution fusion (1x1+bilinear-up for coarser->finer,
strided-3x3 chains that stay at channels[j] until the last conv for
finer->coarser, hrnet.py:155-186), with every weight transplanted."""
import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                num_blocks=(2,), num_channels=(4,)),
    stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                num_blocks=(1, 1), num_channels=(4, 8)),
    stage3=dict(num_modules=2, num_branches=3, block='BASIC',
                num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)


def convbn(cin, cout, k, s=1, p=0, act=False):
    layers = [tnn.Conv2d(cin, cout, k, s, p, bias=False),
              tnn.BatchNorm2d(cout)]
    if act:
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TBasic(tnn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.conv1 = convbn(cin, ch, 3, 1, 1, act=True)
        self.conv2 = convbn(ch, ch, 3, 1, 1)

    def forward(self, x):
        return F.relu(self.conv2(self.conv1(x)) + x)


class TBottle4(tnn.Module):
    def __init__(self, cin, ch, down):
        super().__init__()
        self.conv1 = convbn(cin, ch, 1, act=True)
        self.conv2 = convbn(ch, ch, 3, 1, 1, act=True)
        self.conv3 = convbn(ch, 4 * ch, 1)
        self.down = convbn(cin, 4 * ch, 1) if down else None

    def forward(self, x):
        r = self.down(x) if self.down is not None else x
        return F.relu(self.conv3(self.conv2(self.conv1(x))) + r)


class THRNet(tnn.Module):
    """Mirrors the flax HRNet control flow with modules keyed by the flax
    param names ('__' for nesting), so transplant is a generic walk."""

    def __init__(self, extra):
        super().__init__()
        self.extra = extra
        m = {}
        m['stem1'] = convbn(3, 64, 3, 2, 1, act=True)
        m['stem2'] = convbn(64, 64, 3, 2, 1, act=True)
        ch = extra['stage1']['num_channels'][0]
        in_ch = 64
        for i in range(extra['stage1']['num_blocks'][0]):
            m[f'layer1_{i}'] = TBottle4(in_ch, ch, down=(in_ch != 4 * ch))
            in_ch = 4 * ch
        prev = [in_ch]
        for s in (2, 3, 4):
            scfg = extra.get(f'stage{s}')
            if scfg is None:
                break
            cur = list(scfg['num_channels'])
            for i, c in enumerate(cur):
                if i < len(prev):
                    if prev[i] != c:
                        m[f't{s}_{i}'] = convbn(prev[i], c, 3, 1, 1, act=True)
                else:
                    m[f't{s}_{i}'] = convbn(prev[-1], c, 3, 2, 1, act=True)
            prev = cur
            for mod in range(scfg['num_modules']):
                for i, c in enumerate(cur):
                    for b in range(scfg['num_blocks'][i]):
                        m[f's{s}_m{mod}_b{i}_{b}'] = TBasic(c, c)
                n = len(cur)
                for i in range(n):
                    for j in range(n):
                        if j > i:
                            m[f's{s}_m{mod}_fuse__f{i}_{j}'] = convbn(
                                cur[j], cur[i], 1)
                        elif j < i:
                            for k in range(i - j):
                                last = k == i - j - 1
                                m[f's{s}_m{mod}_fuse__f{i}_{j}_{k}'] = convbn(
                                    cur[j], cur[i] if last else cur[j],
                                    3, 2, 1, act=not last)
        self.mods = tnn.ModuleDict(m)

    def forward(self, x):
        m = self.mods
        x = m['stem2'](m['stem1'](x))
        for i in range(self.extra['stage1']['num_blocks'][0]):
            x = m[f'layer1_{i}'](x)
        xs = [x]
        for s in (2, 3, 4):
            scfg = self.extra.get(f'stage{s}')
            if scfg is None:
                break
            cur = list(scfg['num_channels'])
            new_xs = []
            for i in range(len(cur)):
                key = f't{s}_{i}'
                if i < len(xs):
                    new_xs.append(m[key](xs[i]) if key in m else xs[i])
                else:
                    new_xs.append(m[key](xs[-1]))
            xs = new_xs
            for mod in range(scfg['num_modules']):
                branch = []
                for i in range(len(cur)):
                    h = xs[i]
                    for b in range(scfg['num_blocks'][i]):
                        h = m[f's{s}_m{mod}_b{i}_{b}'](h)
                    branch.append(h)
                fused = []
                for i in range(len(cur)):
                    acc = None
                    for j in range(len(cur)):
                        y = branch[j]
                        if j > i:
                            y = m[f's{s}_m{mod}_fuse__f{i}_{j}'](y)
                            y = F.interpolate(y, size=branch[i].shape[2:],
                                              mode='bilinear',
                                              align_corners=False)
                        elif j < i:
                            for k in range(i - j):
                                y = m[f's{s}_m{mod}_fuse__f{i}_{j}_{k}'](y)
                        acc = y if acc is None else acc + y
                    fused.append(F.relu(acc))
                xs = fused
        return xs


def _copy_convbn(dst, p, s):
    with torch.no_grad():
        dst[0].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['conv']['kernel']), (3, 2, 0, 1)).copy()))
        dst[1].weight.copy_(torch.from_numpy(
            np.asarray(p['norm']['bn']['scale']).copy()))
        dst[1].bias.copy_(torch.from_numpy(
            np.asarray(p['norm']['bn']['bias']).copy()))
        dst[1].running_mean.copy_(torch.from_numpy(
            np.asarray(s['norm']['bn']['mean']).copy()))
        dst[1].running_var.copy_(torch.from_numpy(
            np.asarray(s['norm']['bn']['var']).copy()))


def _transplant(t, p, s):
    for name, mod in t.mods.items():
        path = name.split('__')
        pp, ss = p, s
        for seg in path:
            pp, ss = pp[seg], ss[seg]
        if isinstance(mod, tnn.Sequential):
            _copy_convbn(mod, pp, ss)
        else:  # TBasic / TBottle4
            _copy_convbn(mod.conv1, pp['conv1'], ss['conv1'])
            _copy_convbn(mod.conv2, pp['conv2'], ss['conv2'])
            if hasattr(mod, 'conv3'):
                _copy_convbn(mod.conv3, pp['conv3'], ss['conv3'])
            if getattr(mod, 'down', None) is not None:
                with torch.no_grad():
                    mod.down[0].weight.copy_(torch.from_numpy(np.transpose(
                        np.asarray(pp['downsample_conv']['kernel']),
                        (3, 2, 0, 1)).copy()))
                    bn = pp['downsample_norm']['bn']
                    bs = ss['downsample_norm']['bn']
                    mod.down[1].weight.copy_(torch.from_numpy(
                        np.asarray(bn['scale']).copy()))
                    mod.down[1].bias.copy_(torch.from_numpy(
                        np.asarray(bn['bias']).copy()))
                    mod.down[1].running_mean.copy_(torch.from_numpy(
                        np.asarray(bs['mean']).copy()))
                    mod.down[1].running_var.copy_(torch.from_numpy(
                        np.asarray(bs['var']).copy()))


def test_hrnet_full_parity(rng):
    model = MODELS.build(dict(type='HRNet', extra=EXTRA))
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if t.mean() > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    outs_j = model.apply(variables, jnp.asarray(x), train=False)

    t = THRNet(EXTRA)
    _transplant(t, jax.device_get(variables['params']),
                jax.device_get(variables['batch_stats']))
    t.eval()
    with torch.no_grad():
        outs_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(outs_j) == len(outs_t) == 4
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(oj),
                                   ot.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-3, rtol=1e-3)


def test_hrnet_stage1_expansion4():
    """Reference hrnet.py:383: stage1 out channels = num_channels * 4 (the
    ResNet Bottleneck), pinned via the t2 transition conv input width."""
    model = MODELS.build(dict(type='HRNet', extra=EXTRA))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    k = variables['params']['t2_0']['conv']['kernel']
    assert k.shape[-2] == 16  # 4 channels x expansion 4
