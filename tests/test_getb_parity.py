"""GETB (GlobalLocalAttention) numeric parity vs a torch reimplementation of
the reference module (``UNetFormer_GETB.py:97-206``), weights transplanted.
This pins the windowed-attention reconstruction bit-for-bit."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.getb import GlobalLocalAttention, _relative_position_index

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


class TorchGLA(tnn.Module):
    """Faithful torch version of the reference's GlobalLocalAttention."""

    def __init__(self, dim, num_heads, ws=8):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Conv2d(dim, 3 * dim, 1, bias=False)
        self.proj_dw = tnn.Conv2d(dim, dim, ws, padding=(ws - 1) // 2,
                                  groups=dim, bias=False)
        self.proj_bn = tnn.BatchNorm2d(dim)
        self.proj_pw = tnn.Conv2d(dim, dim, 1, bias=False)
        self.attn_x = tnn.AvgPool2d(kernel_size=(ws, 1), stride=1,
                                    padding=(ws // 2 - 1, 0))
        self.attn_y = tnn.AvgPool2d(kernel_size=(1, ws), stride=1,
                                    padding=(0, ws // 2 - 1))
        self.rel_bias = tnn.Parameter(torch.zeros((2 * ws - 1) ** 2,
                                                  num_heads))
        idx = _relative_position_index(ws)
        self.register_buffer('rel_idx', torch.from_numpy(idx.astype(np.int64)))

    def forward(self, x):
        B, C, H, W = x.shape
        ws = self.ws
        local = x
        pad_w = (ws - W % ws) % ws
        pad_h = (ws - H % ws) % ws
        xp = F.pad(x, (0, pad_w, 0, pad_h), mode='reflect')
        Hp, Wp = H + pad_h, W + pad_w
        qkv = self.qkv(xp)
        hh, ww = Hp // ws, Wp // ws
        hd = C // self.num_heads
        qkv = qkv.reshape(B, 3, self.num_heads, hd, hh, ws, ww, ws)
        qkv = qkv.permute(1, 0, 4, 6, 2, 5, 7, 3).reshape(
            3, B * hh * ww, self.num_heads, ws * ws, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        dots = (q @ k.transpose(-2, -1)) * self.scale
        bias = self.rel_bias[self.rel_idx.view(-1)].view(
            ws * ws, ws * ws, -1).permute(2, 0, 1)
        dots = dots + bias.unsqueeze(0)
        attn = dots.softmax(-1) @ v
        attn = attn.reshape(B, hh, ww, self.num_heads, ws, ws, hd)
        attn = attn.permute(0, 3, 6, 1, 4, 2, 5).reshape(B, C, Hp, Wp)
        attn = attn[:, :, :H, :W]
        out = self.attn_x(F.pad(attn, (0, 0, 0, 1), mode='reflect')) + \
            self.attn_y(F.pad(attn, (0, 1, 0, 0), mode='reflect'))
        out = out + local
        out = F.pad(out, (0, 1, 0, 1), mode='reflect')
        out = self.proj_pw(self.proj_bn(self.proj_dw(out)))
        return out[:, :, :H, :W]


def test_gla_matches_torch(rng):
    dim, heads, ws = 16, 2, 4
    H, W = 10, 14  # non-multiple of ws: exercises the reflect-pad path
    x = rng.standard_normal((1, H, W, dim)).astype(np.float32)

    mod = GlobalLocalAttention(dim, heads, window_size=ws)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.device_get(variables['params'])
    # randomize the bias table so the test is non-trivial
    table = rng.standard_normal(params['relative_position_bias_table'].shape
                                ).astype(np.float32) * 0.2
    params['relative_position_bias_table'] = table
    ours = mod.apply({'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
                     jnp.asarray(x), train=False)

    ref = TorchGLA(dim, heads, ws)
    with torch.no_grad():
        ref.qkv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params['qkv']['kernel']), (3, 2, 0, 1)).copy()))
        # flax depthwise kernel (k,k,1,C) -> torch (C,1,k,k)
        dw = np.asarray(params['proj_dw']['kernel'])
        ref.proj_dw.weight.copy_(torch.from_numpy(
            np.transpose(dw, (3, 2, 0, 1)).copy()))
        pw = np.asarray(params['proj_pw']['kernel'])
        ref.proj_pw.weight.copy_(torch.from_numpy(
            np.transpose(pw, (3, 2, 0, 1)).copy()))
        bn = params['proj_norm']['bn']
        ref.proj_bn.weight.copy_(torch.from_numpy(np.asarray(bn['scale'])))
        ref.proj_bn.bias.copy_(torch.from_numpy(np.asarray(bn['bias'])))
        ref.rel_bias.copy_(torch.from_numpy(table))
    ref.eval()
    out_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_ref = out_ref.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=5e-5,
                               rtol=1e-4)


class TorchWF(tnn.Module):
    """Faithful torch WF/WF1 (``UNetFormer_GETB.py:229-260``)."""

    def __init__(self, in_ch, dec_ch, upsample=True):
        super().__init__()
        self.upsample = upsample
        self.pre_conv = tnn.Conv2d(in_ch, dec_ch, 1, bias=False)
        self.weights = tnn.Parameter(torch.ones(2))
        self.post_conv = tnn.Conv2d(dec_ch, dec_ch, 3, padding=1, bias=False)
        self.post_bn = tnn.BatchNorm2d(dec_ch)

    def forward(self, x, res):
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode='bilinear',
                              align_corners=False)
        w = F.relu(self.weights)
        fuse = w / (w.sum() + 1e-8)
        x = fuse[0] * self.pre_conv(res) + fuse[1] * x
        return F.relu6(self.post_bn(self.post_conv(x)))


@pytest.mark.parametrize('upsample', [True, False])
def test_wf_matches_torch(rng, upsample):
    from lednet_tpu.models.getb import WF
    in_ch, dec_ch = 12, 8
    x = rng.standard_normal((2, 5, 7, dec_ch)).astype(np.float32)
    res_hw = (10, 14) if upsample else (5, 7)
    res = rng.standard_normal((2, *res_hw, in_ch)).astype(np.float32)

    mod = WF(in_ch, dec_ch, upsample=upsample)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(res), train=False)
    params = jax.device_get(variables['params'])
    params['weights'] = np.asarray([0.7, 1.3], np.float32)
    ours = mod.apply({'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
                     jnp.asarray(x), jnp.asarray(res), train=False)

    ref = TorchWF(in_ch, dec_ch, upsample)
    with torch.no_grad():
        ref.pre_conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params['pre_conv']['kernel']), (3, 2, 0, 1)).copy()))
        ref.post_conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params['post_conv']['kernel']), (3, 2, 0, 1)).copy()))
        bn = params['post_norm']['bn']
        ref.post_bn.weight.copy_(torch.from_numpy(np.asarray(bn['scale'])))
        ref.post_bn.bias.copy_(torch.from_numpy(np.asarray(bn['bias'])))
        ref.weights.copy_(torch.from_numpy(params['weights']))
    ref.eval()
    out_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(res.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), out_ref.detach().numpy().transpose(0, 2, 3, 1),
        atol=5e-5, rtol=1e-4)


class TorchFRH(tnn.Module):
    """Faithful torch FeatureRefinementHead (``UNetFormer_GETB.py:263-297``)."""

    def __init__(self, in_ch, dec_ch):
        super().__init__()
        self.pre_conv = tnn.Conv2d(in_ch, dec_ch, 1, bias=False)
        self.weights = tnn.Parameter(torch.ones(2))
        self.post_conv = tnn.Conv2d(dec_ch, dec_ch, 3, padding=1, bias=False)
        self.post_bn = tnn.BatchNorm2d(dec_ch)
        self.pa_conv = tnn.Conv2d(dec_ch, dec_ch, 3, padding=1,
                                  groups=dec_ch)  # biased (reference default)
        self.ca_fc1 = tnn.Conv2d(dec_ch, max(dec_ch // 16, 1), 1, bias=False)
        self.ca_fc2 = tnn.Conv2d(max(dec_ch // 16, 1), dec_ch, 1, bias=False)
        self.shortcut_conv = tnn.Conv2d(dec_ch, dec_ch, 1, bias=False)
        self.shortcut_bn = tnn.BatchNorm2d(dec_ch)
        self.proj_dw = tnn.Conv2d(dec_ch, dec_ch, 3, padding=1,
                                  groups=dec_ch, bias=False)
        self.proj_bn = tnn.BatchNorm2d(dec_ch)
        self.proj_pw = tnn.Conv2d(dec_ch, dec_ch, 1, bias=False)

    def forward(self, x, res):
        x = F.interpolate(x, scale_factor=2, mode='bilinear',
                          align_corners=False)
        w = F.relu(self.weights)
        fuse = w / (w.sum() + 1e-8)
        x = fuse[0] * self.pre_conv(res) + fuse[1] * x
        x = F.relu6(self.post_bn(self.post_conv(x)))
        shortcut = self.shortcut_bn(self.shortcut_conv(x))
        pa = torch.sigmoid(self.pa_conv(x)) * x
        ca = torch.sigmoid(self.ca_fc2(F.relu6(self.ca_fc1(
            F.adaptive_avg_pool2d(x, 1))))) * x
        x = pa + ca
        x = self.proj_pw(self.proj_bn(self.proj_dw(x))) + shortcut
        return F.relu6(x)


def test_feature_refinement_head_matches_torch(rng):
    from lednet_tpu.models.getb import FeatureRefinementHead
    in_ch, dec_ch = 24, 32
    x = rng.standard_normal((1, 6, 8, dec_ch)).astype(np.float32)
    res = rng.standard_normal((1, 12, 16, in_ch)).astype(np.float32)

    mod = FeatureRefinementHead(in_ch, dec_ch)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(res), train=False)
    params = jax.device_get(variables['params'])
    params['weights'] = np.asarray([1.4, 0.6], np.float32)
    ours = mod.apply({'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
                     jnp.asarray(x), jnp.asarray(res), train=False)

    ref = TorchFRH(in_ch, dec_ch)
    with torch.no_grad():
        def _conv(dst, src):
            dst.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(src['kernel']), (3, 2, 0, 1)).copy()))
            if 'bias' in src:
                dst.bias.copy_(torch.from_numpy(np.asarray(src['bias'])))

        def _bn(dst, src):
            dst.weight.copy_(torch.from_numpy(np.asarray(src['bn']['scale'])))
            dst.bias.copy_(torch.from_numpy(np.asarray(src['bn']['bias'])))

        _conv(ref.pre_conv, params['pre_conv'])
        _conv(ref.post_conv, params['post_conv'])
        _bn(ref.post_bn, params['post_norm'])
        _conv(ref.pa_conv, params['pa_conv'])
        _conv(ref.ca_fc1, params['ca_fc1'])
        _conv(ref.ca_fc2, params['ca_fc2'])
        _conv(ref.shortcut_conv, params['shortcut_conv'])
        _bn(ref.shortcut_bn, params['shortcut_norm'])
        _conv(ref.proj_dw, params['proj_dw'])
        _bn(ref.proj_bn, params['proj_norm'])
        _conv(ref.proj_pw, params['proj_pw'])
        ref.weights.copy_(torch.from_numpy(params['weights']))
    ref.eval()
    out_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(res.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), out_ref.detach().numpy().transpose(0, 2, 3, 1),
        atol=5e-5, rtol=1e-4)


def test_aux_head_shapes(rng):
    from lednet_tpu.models.getb import AuxHead
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    mod = AuxHead(16, num_classes=5)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), 32, 32,
                         train=False)
    out = mod.apply(variables, jnp.asarray(x), 32, 32, train=False)
    assert out.shape == (2, 32, 32, 5)
