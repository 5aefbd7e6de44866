"""Block-level torch parity for ERFNet and CGNet building blocks
(reference ``mmseg/models/backbones/erfnet.py`` / ``cgnet.py``) with
transplanted weights: ERFNet's DownsamplerBlock (conv || maxpool concat,
BN after the concat), NonBottleneck1d (factorized 3x1/1x3 pairs, second
pair dilated), UpsamplerBlock (deconv geometry), and CGNet's
ContextGuidedBlock (1x1 reduce -> depthwise local + dilated surround ->
joint BN+PReLU -> squeeze-excite global context, residual)."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.backbones.cgnet import ContextGuidedBlock
from lednet_tpu.models.backbones.erfnet import (DownsamplerBlock,
                                                NonBottleneck1d,
                                                UpsamplerBlock)


def _to_torch_conv(conv, p, key='kernel'):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p[key]), (3, 2, 0, 1)).copy()))
        if conv.bias is not None:
            conv.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))


def _to_torch_bn(bn, p, s):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p['scale']).copy()))
        bn.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(s['mean']).copy()))
        bn.running_var.copy_(torch.from_numpy(np.asarray(s['var']).copy()))


def _init(mod, x, rng):
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables.get('batch_stats', {}))
    return {'params': variables['params'], 'batch_stats': stats}


def test_erfnet_downsampler_matches_torch(rng):
    x = rng.standard_normal((2, 16, 20, 8)).astype(np.float32)
    mod = DownsamplerBlock(8, 24)
    v = _init(mod, x, rng)
    out_j = mod.apply(v, jnp.asarray(x), train=False)

    conv = tnn.Conv2d(8, 16, 3, 2, 1)
    bn = tnn.BatchNorm2d(24, eps=1e-3)
    _to_torch_conv(conv, v['params']['conv'])
    _to_torch_bn(bn, v['params']['bn']['bn'], v['batch_stats']['bn']['bn'])
    bn.eval()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out_t = F.relu(bn(torch.cat(
            [conv(xt), F.max_pool2d(xt, 2, 2)], 1)))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_erfnet_nonbottleneck1d_matches_torch(rng):
    x = rng.standard_normal((1, 12, 14, 16)).astype(np.float32)
    mod = NonBottleneck1d(16, dilation=2)
    v = _init(mod, x, rng)
    out_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    c31a = tnn.Conv2d(16, 16, (3, 1), padding=(1, 0))
    c13a = tnn.Conv2d(16, 16, (1, 3), padding=(0, 1))
    bn1 = tnn.BatchNorm2d(16, eps=1e-3)
    c31b = tnn.Conv2d(16, 16, (3, 1), padding=(2, 0), dilation=(2, 1))
    c13b = tnn.Conv2d(16, 16, (1, 3), padding=(0, 2), dilation=(1, 2))
    bn2 = tnn.BatchNorm2d(16, eps=1e-3)
    _to_torch_conv(c31a, p['conv3x1_1'])
    _to_torch_conv(c13a, p['conv1x3_1'])
    _to_torch_bn(bn1, p['bn1']['bn'], s['bn1']['bn'])
    _to_torch_conv(c31b, p['conv3x1_2'])
    _to_torch_conv(c13b, p['conv1x3_2'])
    _to_torch_bn(bn2, p['bn2']['bn'], s['bn2']['bn'])
    bn1.eval(), bn2.eval()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = F.relu(bn1(c13a(F.relu(c31a(xt)))))
        h = bn2(c13b(F.relu(c31b(h))))
        out_t = F.relu(xt + h)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_erfnet_upsampler_matches_torch(rng):
    x = rng.standard_normal((1, 6, 7, 12)).astype(np.float32)
    mod = UpsamplerBlock(12, 8)
    v = _init(mod, x, rng)
    out_j = mod.apply(v, jnp.asarray(x), train=False)

    deconv = tnn.ConvTranspose2d(12, 8, 3, stride=2, padding=1,
                                 output_padding=1)
    bn = tnn.BatchNorm2d(8, eps=1e-3)
    # flax ConvTranspose kernel (kh, kw, in, out) == torch flipped spatially
    k = np.asarray(v['params']['deconv']['kernel'])
    with torch.no_grad():
        deconv.weight.copy_(torch.from_numpy(
            k[::-1, ::-1].transpose(2, 3, 0, 1).copy()))
        deconv.bias.copy_(torch.from_numpy(
            np.asarray(v['params']['deconv']['bias']).copy()))
    _to_torch_bn(bn, v['params']['bn']['bn'], v['batch_stats']['bn']['bn'])
    bn.eval()
    with torch.no_grad():
        out_t = F.relu(bn(deconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))))
    assert out_t.shape[2:] == (12, 14)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


class TCGBlock(tnn.Module):
    """Literal reference ContextGuidedBlock (cgnet.py:55-150)."""

    def __init__(self, cin, cout, dilation=2, reduction=4, downsample=False):
        super().__init__()
        self.downsample = downsample
        ch = cout if downsample else cout // 2
        k, s2, pad = (3, 2, 1) if downsample else (1, 1, 0)
        self.conv1x1 = tnn.Sequential(
            tnn.Conv2d(cin, ch, k, s2, pad, bias=False),
            tnn.BatchNorm2d(ch), tnn.PReLU(ch))
        self.f_loc = tnn.Conv2d(ch, ch, 3, padding=1, groups=ch, bias=False)
        self.f_sur = tnn.Conv2d(ch, ch, 3, padding=dilation,
                                dilation=dilation, groups=ch, bias=False)
        self.bn = tnn.BatchNorm2d(2 * ch)
        self.act = tnn.PReLU(2 * ch)
        self.reduce = tnn.Conv2d(2 * ch, cout, 1, bias=False) \
            if downsample else None
        self.fc = tnn.Sequential(
            tnn.Linear(cout, cout // reduction), tnn.ReLU(),
            tnn.Linear(cout // reduction, cout), tnn.Sigmoid())

    def forward(self, x):
        h = self.conv1x1(x)
        joi = self.act(self.bn(torch.cat([self.f_loc(h), self.f_sur(h)], 1)))
        if self.reduce is not None:
            joi = self.reduce(joi)
        y = self.fc(joi.mean((2, 3)))[:, :, None, None]
        out = joi * y
        if not self.downsample:
            out = x + out
        return out


def _copy_prelu(dst, p):
    with torch.no_grad():
        dst.weight.copy_(torch.from_numpy(np.asarray(p['alpha']).copy()))


def _copy_linear(dst, p):
    with torch.no_grad():
        dst.weight.copy_(torch.from_numpy(
            np.asarray(p['kernel']).T.copy()))
        dst.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))


import pytest

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


@pytest.mark.parametrize('downsample', [False, True])
def test_cgnet_block_matches_torch(rng, downsample):
    cin, cout = 16, 16 if not downsample else 32
    x = rng.standard_normal((1, 12, 14, cin)).astype(np.float32)
    mod = ContextGuidedBlock(cin, cout, dilation=2, reduction=4,
                             downsample=downsample)
    v = _init(mod, x, rng)
    out_j = mod.apply(v, jnp.asarray(x), train=False)

    t = TCGBlock(cin, cout, dilation=2, reduction=4, downsample=downsample)
    p, s = v['params'], v['batch_stats']
    _to_torch_conv(t.conv1x1[0], p['conv1x1'])
    _to_torch_bn(t.conv1x1[1], p['norm1']['bn'], s['norm1']['bn'])
    _copy_prelu(t.conv1x1[2], p['act1'])
    _to_torch_conv(t.f_loc, p['f_loc'])
    _to_torch_conv(t.f_sur, p['f_sur'])
    _to_torch_bn(t.bn, p['bn']['bn'], s['bn']['bn'])
    _copy_prelu(t.act, p['act2'])
    if downsample:
        _to_torch_conv(t.reduce, p['reduce'])
    _copy_linear(t.fc[0], p['f_glo']['fc1'])
    _copy_linear(t.fc[2], p['f_glo']['fc2'])
    t.eval()
    with torch.no_grad():
        out_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Whole-network ERFNet parity (reference erfnet.py:194-329 assembly: blocks
# keep their own BN eps=1e-3 defaults; DownsamplerBlock bilinearly resizes
# the pooled branch to the conv branch for odd inputs, erfnet.py:56-61).
# ---------------------------------------------------------------------------

ENC_DOWN = (8, 16, 32)
ENC_NB = (2, 4)
ENC_DIL = (2, 4, 8, 16)
DEC_UP = (16, 8)
DEC_NB = (1, 1)


class TDown(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout - cin, 3, 2, 1)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        c = self.conv(x)
        p = F.max_pool2d(x, 2, 2)
        if p.shape[2:] != c.shape[2:]:
            p = F.interpolate(p, c.shape[2:], mode='bilinear',
                              align_corners=False)
        return F.relu(self.bn(torch.cat([c, p], 1)))


class TNB1d(tnn.Module):
    def __init__(self, ch, dilation=1):
        super().__init__()
        d = dilation
        self.c31a = tnn.Conv2d(ch, ch, (3, 1), padding=(1, 0))
        self.c13a = tnn.Conv2d(ch, ch, (1, 3), padding=(0, 1))
        self.bn1 = tnn.BatchNorm2d(ch, eps=1e-3)
        self.c31b = tnn.Conv2d(ch, ch, (3, 1), padding=(d, 0),
                               dilation=(d, 1))
        self.c13b = tnn.Conv2d(ch, ch, (1, 3), padding=(0, d),
                               dilation=(1, d))
        self.bn2 = tnn.BatchNorm2d(ch, eps=1e-3)

    def forward(self, x):
        h = F.relu(self.bn1(self.c13a(F.relu(self.c31a(x)))))
        h = self.bn2(self.c13b(F.relu(self.c31b(h))))
        return F.relu(x + h)


class TUp(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.deconv = tnn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                                          output_padding=1)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.deconv(x)))


class TERFNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.down0 = TDown(3, ENC_DOWN[0])
        self.down1 = TDown(ENC_DOWN[0], ENC_DOWN[1])
        self.enc1 = tnn.ModuleList(
            [TNB1d(ENC_DOWN[1]) for _ in range(ENC_NB[0])])
        self.down2 = TDown(ENC_DOWN[1], ENC_DOWN[2])
        self.enc2 = tnn.ModuleList(
            [TNB1d(ENC_DOWN[2], ENC_DIL[i % 4]) for i in range(ENC_NB[1])])
        self.ups, self.decs = tnn.ModuleList(), tnn.ModuleList()
        cin = ENC_DOWN[2]
        for s, ch in enumerate(DEC_UP):
            self.ups.append(TUp(cin, ch))
            self.decs.append(tnn.ModuleList(
                [TNB1d(ch) for _ in range(DEC_NB[s])]))
            cin = ch

    def forward(self, x):
        x = self.down1(self.down0(x))
        for m in self.enc1:
            x = m(x)
        x = self.down2(x)
        for m in self.enc2:
            x = m(x)
        for up, decs in zip(self.ups, self.decs):
            x = up(x)
            for m in decs:
                x = m(x)
        return x


def _copy_nb1d(t, p, s):
    _to_torch_conv(t.c31a, p['conv3x1_1'])
    _to_torch_conv(t.c13a, p['conv1x3_1'])
    _to_torch_bn(t.bn1, p['bn1']['bn'], s['bn1']['bn'])
    _to_torch_conv(t.c31b, p['conv3x1_2'])
    _to_torch_conv(t.c13b, p['conv1x3_2'])
    _to_torch_bn(t.bn2, p['bn2']['bn'], s['bn2']['bn'])


def _copy_down(t, p, s):
    _to_torch_conv(t.conv, p['conv'])
    _to_torch_bn(t.bn, p['bn']['bn'], s['bn']['bn'])


def _copy_up(t, p, s):
    k = np.asarray(p['deconv']['kernel'])
    with torch.no_grad():
        t.deconv.weight.copy_(torch.from_numpy(
            k[::-1, ::-1].transpose(2, 3, 0, 1).copy()))
        t.deconv.bias.copy_(torch.from_numpy(
            np.asarray(p['deconv']['bias']).copy()))
    _to_torch_bn(t.bn, p['bn']['bn'], s['bn']['bn'])


def test_erfnet_full_parity(rng):
    from lednet_tpu.registry import MODELS
    import lednet_tpu.models  # noqa: F401
    model = MODELS.build(dict(
        type='ERFNet', enc_downsample_channels=ENC_DOWN,
        enc_stage_non_bottlenecks=ENC_NB,
        enc_non_bottleneck_dilations=ENC_DIL,
        enc_non_bottleneck_channels=(16, 32),
        dec_upsample_channels=DEC_UP, dec_stages_non_bottleneck=DEC_NB,
        dec_non_bottleneck_channels=DEC_UP, dropout_ratio=0.1))
    x = rng.standard_normal((1, 63, 45, 3)).astype(np.float32)  # odd sizes
    v = _init(model, x, rng)
    out_j, = model.apply(v, jnp.asarray(x), train=False)

    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    t = TERFNet()
    _copy_down(t.down0, p['down0'], s['down0'])
    _copy_down(t.down1, p['down1'], s['down1'])
    _copy_down(t.down2, p['down2'], s['down2'])
    for i in range(ENC_NB[0]):
        _copy_nb1d(t.enc1[i], p[f'enc1_{i}'], s[f'enc1_{i}'])
    for i in range(ENC_NB[1]):
        _copy_nb1d(t.enc2[i], p[f'enc2_{i}'], s[f'enc2_{i}'])
    for sidx in range(2):
        _copy_up(t.ups[sidx], p[f'up{sidx}'], s[f'up{sidx}'])
        for i in range(DEC_NB[sidx]):
            _copy_nb1d(t.decs[sidx][i], p[f'dec{sidx}_{i}'],
                       s[f'dec{sidx}_{i}'])

    t.eval()
    with torch.no_grad():
        out_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Whole-network CGNet parity (reference cgnet.py:186-360: 3-conv stem,
# avg-pooled input injections, norm_prelu fusion points, two CG stages with
# the stage-entry downsample block's feature re-concatenated at the exit).
# ---------------------------------------------------------------------------

CG_CH = (8, 16, 32)
CG_BLOCKS = (2, 3)
CG_DIL = (2, 4)
CG_RED = (4, 8)


class TCGNet(tnn.Module):
    def __init__(self):
        super().__init__()
        c0, c1, c2 = CG_CH
        self.stem = tnn.ModuleList()
        cur = 3
        for i in range(3):
            self.stem.append(tnn.Sequential(
                tnn.Conv2d(cur, c0, 3, 2 if i == 0 else 1, 1, bias=False),
                tnn.BatchNorm2d(c0), tnn.PReLU(c0)))
            cur = c0
        self.np0 = tnn.Sequential(tnn.BatchNorm2d(c0 + 3),
                                  tnn.PReLU(c0 + 3))
        self.level1 = tnn.ModuleList([
            TCGBlock(c0 + 3 if i == 0 else c1, c1, CG_DIL[0], CG_RED[0],
                     downsample=(i == 0)) for i in range(CG_BLOCKS[0])])
        self.np1 = tnn.Sequential(tnn.BatchNorm2d(2 * c1 + 3),
                                  tnn.PReLU(2 * c1 + 3))
        self.level2 = tnn.ModuleList([
            TCGBlock(2 * c1 + 3 if i == 0 else c2, c2, CG_DIL[1], CG_RED[1],
                     downsample=(i == 0)) for i in range(CG_BLOCKS[1])])
        self.np2 = tnn.Sequential(tnn.BatchNorm2d(2 * c2),
                                  tnn.PReLU(2 * c2))

    def forward(self, x):
        inp2 = F.avg_pool2d(x, 3, 2, 1)
        inp4 = F.avg_pool2d(inp2, 3, 2, 1)
        h = x
        for m in self.stem:
            h = m(h)
        h = self.np0(torch.cat([h, inp2], 1))
        out0 = h
        for i, m in enumerate(self.level1):
            h = m(h)
            if i == 0:
                down1 = h
        h = self.np1(torch.cat([h, down1, inp4], 1))
        out1 = h
        for i, m in enumerate(self.level2):
            h = m(h)
            if i == 0:
                down2 = h
        h = self.np2(torch.cat([down2, h], 1))
        return out0, out1, h


def _copy_cgblock(t, p, s):
    _to_torch_conv(t.conv1x1[0], p['conv1x1'])
    _to_torch_bn(t.conv1x1[1], p['norm1']['bn'], s['norm1']['bn'])
    _copy_prelu(t.conv1x1[2], p['act1'])
    _to_torch_conv(t.f_loc, p['f_loc'])
    _to_torch_conv(t.f_sur, p['f_sur'])
    _to_torch_bn(t.bn, p['bn']['bn'], s['bn']['bn'])
    _copy_prelu(t.act, p['act2'])
    if t.reduce is not None:
        _to_torch_conv(t.reduce, p['reduce'])
    _copy_linear(t.fc[0], p['f_glo']['fc1'])
    _copy_linear(t.fc[2], p['f_glo']['fc2'])


def test_cgnet_full_parity(rng):
    from lednet_tpu.registry import MODELS
    import lednet_tpu.models  # noqa: F401
    model = MODELS.build(dict(
        type='CGNet', num_channels=CG_CH, num_blocks=CG_BLOCKS,
        dilations=CG_DIL, reductions=CG_RED))
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    v = _init(model, x, rng)
    outs_j = model.apply(v, jnp.asarray(x), train=False)

    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    t = TCGNet()
    for i in range(3):
        _to_torch_conv(t.stem[i][0], p[f'stem{i}'])
        _to_torch_bn(t.stem[i][1], p[f'stem_norm{i}']['bn'],
                     s[f'stem_norm{i}']['bn'])
        _copy_prelu(t.stem[i][2], p[f'stem_act{i}'])
    for k, np_t in ((0, t.np0), (1, t.np1), (2, t.np2)):
        _to_torch_bn(np_t[0], p[f'norm_prelu_{k}']['bn'],
                     s[f'norm_prelu_{k}']['bn'])
        _copy_prelu(np_t[1], p[f'act_prelu_{k}'])
    for i in range(CG_BLOCKS[0]):
        _copy_cgblock(t.level1[i], p[f'level1_{i}'], s[f'level1_{i}'])
    for i in range(CG_BLOCKS[1]):
        _copy_cgblock(t.level2[i], p[f'level2_{i}'], s[f'level2_{i}'])

    t.eval()
    with torch.no_grad():
        outs_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs_j) == 3
    for k, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f'stage{k}')
