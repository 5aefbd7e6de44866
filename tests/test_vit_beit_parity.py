"""Torch parity for the ViT backbone (bicubic pos-embed resize, cls token,
final-norm placement — reference ``mmseg/models/backbones/vit.py``) and the
BEiT attention block (qv-bias + relative position bias with cls entries —
reference ``mmseg/models/backbones/beit.py:23-149``), transplanted weights.
"""
import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.backbones.resnext import BEiT
from lednet_tpu.models.backbones.vit import VisionTransformer

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def _dense_to_torch(lin, p):
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p['kernel']).T.copy()))
        if lin.bias is not None and 'bias' in p:
            lin.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))


def _ln_to_torch(ln, p):
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(np.asarray(p['scale']).copy()))
        ln.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))


def test_vit_matches_torch_reference(rng):
    """Full tiny ViT, run at a different resolution than img_size so the
    bicubic pos-embed resample path is exercised."""
    D, L, H, P = 16, 2, 2, 8
    mod = VisionTransformer(img_size=32, patch_size=P, embed_dims=D,
                            num_layers=L, num_heads=H, out_indices=(0, 1),
                            final_norm=True)
    x = rng.standard_normal((2, 48, 40, 3)).astype(np.float32)
    v = mod.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                 train=False)
    # randomize params so parity is meaningful
    flat = jax.tree_util.tree_map(
        lambda t: jnp.asarray(
            rng.standard_normal(t.shape).astype(np.float32) * 0.05),
        v['params'])
    v = {'params': flat}
    outs_j = mod.apply(v, jnp.asarray(x), train=False)

    p = v['params']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        # patch embed (bias-free per reference patch_bias=False default)
        proj = tnn.Conv2d(3, D, P, P, bias=False)
        proj.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['patch_embed']['kernel']), (3, 2, 0, 1)).copy()))
        feat = proj(xt)                       # (B, D, 6, 5)
        gh, gw = feat.shape[2], feat.shape[3]
        tok = feat.flatten(2).transpose(1, 2)
        cls = torch.from_numpy(np.asarray(p['cls_token']).copy())
        tok = torch.cat([cls.expand(2, -1, -1), tok], dim=1)
        pos = torch.from_numpy(np.asarray(p['pos_embed']).copy())
        # resize_pos_embed: bicubic align_corners=False on the grid part
        grid = pos[:, 1:].reshape(1, 4, 4, D).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(gh, gw), mode='bicubic',
                             align_corners=False)
        grid = grid.flatten(2).transpose(1, 2)
        tok = tok + torch.cat([pos[:, :1], grid], dim=1)

        hdim = D // H
        for i in range(L):
            ln1 = tnn.LayerNorm(D)
            _ln_to_torch(ln1, p[f'b{i}_norm1'])
            qkv = tnn.Linear(D, 3 * D)
            _dense_to_torch(qkv, p[f'b{i}_attn']['qkv'])
            po = tnn.Linear(D, D)
            _dense_to_torch(po, p[f'b{i}_attn']['proj'])
            h = ln1(tok)
            B, N, _ = h.shape
            q, k, vv = qkv(h).reshape(B, N, 3, H, hdim).permute(
                2, 0, 3, 1, 4)
            attn = (q @ k.transpose(-2, -1)) * hdim ** -0.5
            attn = attn.softmax(-1)
            h = (attn @ vv).transpose(1, 2).reshape(B, N, D)
            tok = tok + po(h)
            ln2 = tnn.LayerNorm(D)
            _ln_to_torch(ln2, p[f'b{i}_norm2'])
            fc1 = tnn.Linear(D, 4 * D)
            fc2 = tnn.Linear(4 * D, D)
            _dense_to_torch(fc1, p[f'b{i}_fc1'])
            _dense_to_torch(fc2, p[f'b{i}_fc2'])
            tok = tok + fc2(F.gelu(fc1(ln2(tok))))
            if i == L - 1:
                fn = tnn.LayerNorm(D)
                _ln_to_torch(fn, p['final_norm'])
                tok = fn(tok)

    out_t = tok[:, 1:].reshape(2, gh, gw, D).numpy()
    np.testing.assert_allclose(np.asarray(outs_j[-1]), out_t,
                               atol=2e-4, rtol=2e-4)


def test_beit_attention_matches_torch(rng):
    """One BEiT block at the native grid: qv-bias, rel-pos bias with cls
    rows, gamma layer-scaling."""
    D, H, P = 16, 4, 8
    mod = BEiT(img_size=32, patch_size=P, embed_dims=D, num_layers=1,
               num_heads=H, out_indices=(0,), init_values=0.1)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    v = mod.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                 train=False)
    flat = jax.tree_util.tree_map(
        lambda t: jnp.asarray(
            rng.standard_normal(t.shape).astype(np.float32) * 0.05),
        v['params'])
    v = {'params': flat}
    out_j = mod.apply(v, jnp.asarray(x), train=False)[0]

    p = v['params']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        proj = tnn.Conv2d(3, D, P, P, bias=True)
        proj.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['patch_embed']['kernel']), (3, 2, 0, 1)).copy()))
        proj.bias.copy_(torch.from_numpy(
            np.asarray(p['patch_embed']['bias']).copy()))
        feat = proj(xt)
        gh, gw = feat.shape[2], feat.shape[3]
        tok = feat.flatten(2).transpose(1, 2)
        cls = torch.from_numpy(np.asarray(p['cls_token']).copy())
        tok = torch.cat([cls.expand(1, -1, -1), tok], dim=1)

        ap = p['b0_attn']
        ln1 = tnn.LayerNorm(D)
        _ln_to_torch(ln1, p['b0_norm1'])
        h = ln1(tok)
        qkv_w = torch.from_numpy(np.asarray(ap['qkv']['kernel']).T.copy())
        q_bias = torch.from_numpy(np.asarray(ap['q_bias']).copy())
        v_bias = torch.from_numpy(np.asarray(ap['v_bias']).copy())
        qkv_bias = torch.cat([q_bias, torch.zeros_like(v_bias), v_bias])
        qkv = F.linear(h, qkv_w, qkv_bias)
        B, N, _ = h.shape
        hd = D // H
        q, k, vv = qkv.reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        # relative position bias, reference beit.py:116-149
        table = torch.from_numpy(
            np.asarray(ap['relative_position_bias_table']).copy())
        coords = torch.stack(torch.meshgrid(
            [torch.arange(gh), torch.arange(gw)], indexing='ij'))
        flat_c = torch.flatten(coords, 1)
        rel = (flat_c[:, :, None] - flat_c[:, None, :]).permute(
            1, 2, 0).contiguous()
        rel[:, :, 0] += gh - 1
        rel[:, :, 1] += gw - 1
        rel[:, :, 0] *= 2 * gw - 1
        nrel = (2 * gh - 1) * (2 * gw - 1) + 3
        idx = torch.zeros((gh * gw + 1,) * 2, dtype=rel.dtype)
        idx[1:, 1:] = rel.sum(-1)
        idx[0, 0:] = nrel - 3
        idx[0:, 0] = nrel - 2
        idx[0, 0] = nrel - 1
        bias = table[idx.view(-1)].view(gh * gw + 1, gh * gw + 1,
                                        -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        attn = attn.softmax(-1)
        h = (attn @ vv).transpose(1, 2).reshape(B, N, D)
        po = tnn.Linear(D, D)
        _dense_to_torch(po, ap['proj'])
        g1 = torch.from_numpy(np.asarray(p['b0_gamma1']).copy())
        g2 = torch.from_numpy(np.asarray(p['b0_gamma2']).copy())
        tok = tok + g1 * po(h)
        ln2 = tnn.LayerNorm(D)
        _ln_to_torch(ln2, p['b0_norm2'])
        fc1 = tnn.Linear(D, 4 * D)
        fc2 = tnn.Linear(4 * D, D)
        _dense_to_torch(fc1, p['b0_fc1'])
        _dense_to_torch(fc2, p['b0_fc2'])
        tok = tok + g2 * fc2(F.gelu(fc1(ln2(tok))))

    out_t = tok[:, 1:].reshape(1, gh, gw, D).numpy()
    np.testing.assert_allclose(np.asarray(out_j), out_t,
                               atol=2e-4, rtol=2e-4)


def test_dpt_head_matches_torch(rng):
    """Full DPT head, readout='project', vs a torch reimplementation of
    reference ``dpt_head.py`` with transplanted weights."""
    from lednet_tpu.models.decode_heads.point_setr_heads import DPTHead

    C, CH = 12, 8
    ppc = (6, 12, 24, 48)
    head = DPTHead(in_channels=(C,) * 4, channels=CH, num_classes=4,
                   embed_dims=C, post_process_channels=ppc,
                   readout_type='project', dropout_ratio=0.0,
                   in_index=(0, 1, 2, 3))
    feats = []
    for _ in range(4):
        feats.append((
            jnp.asarray(rng.standard_normal((1, 4, 4, C)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((1, C)).astype(np.float32))))
    v = head.init({'params': jax.random.PRNGKey(0)}, list(feats), train=False)
    flat = jax.tree_util.tree_map(
        lambda t: jnp.asarray(
            rng.standard_normal(t.shape).astype(np.float32) * 0.1),
        v['params'])
    # keep BN stats neutral-but-random
    stats = jax.tree_util.tree_map(
        lambda t: jnp.asarray(
            rng.standard_normal(t.shape).astype(np.float32) * 0.05
            + (1.0 if float(t.mean()) > 0.5 else 0.0)),
        v.get('batch_stats', {}))
    v = {'params': flat, 'batch_stats': stats}
    out_j = head.apply(v, list(feats), train=False)

    p, s = v['params'], v['batch_stats']

    def conv_bn(name, cin, cout, k, stride=1, pad=0, bias=True, bn=False):
        conv = tnn.Conv2d(cin, cout, k, stride, pad, bias=bias)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(p[name]['conv']['kernel']), (3, 2, 0, 1)).copy()))
            if bias:
                conv.bias.copy_(torch.from_numpy(
                    np.asarray(p[name]['conv']['bias']).copy()))
        if not bn:
            return conv, None
        norm = tnn.BatchNorm2d(cout)
        with torch.no_grad():
            norm.weight.copy_(torch.from_numpy(
                np.asarray(p[name]['norm']['bn']['scale']).copy()))
            norm.bias.copy_(torch.from_numpy(
                np.asarray(p[name]['norm']['bn']['bias']).copy()))
            norm.running_mean.copy_(torch.from_numpy(
                np.asarray(s[name]['norm']['bn']['mean']).copy()))
            norm.running_var.copy_(torch.from_numpy(
                np.asarray(s[name]['norm']['bn']['var']).copy()))
        norm.eval()
        return conv, norm

    def rcu(prefix, x):
        # act -> conv(bias=False) -> BN, twice, + identity
        h = x
        for cname in ('conv1', 'conv2'):
            conv = tnn.Conv2d(CH, CH, 3, 1, 1, bias=False)
            bn = tnn.BatchNorm2d(CH)
            q = p[prefix][cname]
            qs = s[prefix][cname]
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(np.transpose(
                    np.asarray(q['conv']['kernel']), (3, 2, 0, 1)).copy()))
                bn.weight.copy_(torch.from_numpy(
                    np.asarray(q['norm']['bn']['scale']).copy()))
                bn.bias.copy_(torch.from_numpy(
                    np.asarray(q['norm']['bn']['bias']).copy()))
                bn.running_mean.copy_(torch.from_numpy(
                    np.asarray(qs['norm']['bn']['mean']).copy()))
                bn.running_var.copy_(torch.from_numpy(
                    np.asarray(qs['norm']['bn']['var']).copy()))
            bn.eval()
            h = bn(conv(F.relu(h)))
        return h + x

    with torch.no_grad():
        reassembled = []
        for i, (x, cls) in enumerate(feats):
            xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
            clst = torch.from_numpy(np.asarray(cls))
            # readout 'project'
            B, _, H, W = xt.shape
            tok = xt.flatten(2).permute(0, 2, 1)
            readout = clst.unsqueeze(1).expand_as(tok)
            lin = tnn.Linear(2 * C, C)
            _dense_to_torch(lin, p[f'readout{i}'])
            tok = F.gelu(lin(torch.cat([tok, readout], -1)))
            xt = tok.permute(0, 2, 1).reshape(B, C, H, W)
            proj, _ = conv_bn(f'project{i}', C, ppc[i], 1)
            xt = proj(xt)
            if i == 0:
                dz = tnn.ConvTranspose2d(ppc[0], ppc[0], 4, 4, 0)
                dz.weight.copy_(torch.from_numpy(np.transpose(
                    np.asarray(p['resize0']['kernel']), (3, 2, 0, 1)).copy()))
                dz.bias.copy_(torch.from_numpy(
                    np.asarray(p['resize0']['bias']).copy()))
                xt = dz(xt)
            elif i == 1:
                dz = tnn.ConvTranspose2d(ppc[1], ppc[1], 2, 2, 0)
                dz.weight.copy_(torch.from_numpy(np.transpose(
                    np.asarray(p['resize1']['kernel']), (3, 2, 0, 1)).copy()))
                dz.bias.copy_(torch.from_numpy(
                    np.asarray(p['resize1']['bias']).copy()))
                xt = dz(xt)
            elif i == 3:
                cz = tnn.Conv2d(ppc[3], ppc[3], 3, 2, 1)
                cz.weight.copy_(torch.from_numpy(np.transpose(
                    np.asarray(p['resize3']['kernel']), (3, 2, 0, 1)).copy()))
                cz.bias.copy_(torch.from_numpy(
                    np.asarray(p['resize3']['bias']).copy()))
                xt = cz(xt)
            reassembled.append(xt)
        levels = []
        for i, xt in enumerate(reassembled):
            conv, _ = conv_bn(f'conv{i}', ppc[i], CH, 3, 1, 1, bias=False)
            levels.append(conv(xt))
        out = None
        for i in range(4):
            x = levels[-1] if i == 0 else out
            if i > 0:
                res = levels[-(i + 1)]
                if res.shape[2:] != x.shape[2:]:
                    res = F.interpolate(res, size=x.shape[2:],
                                        mode='bilinear', align_corners=False)
                x = x + rcu(f'fusion{i}_rcu1', res)
            x = rcu(f'fusion{i}_rcu2', x)
            x = F.interpolate(x, scale_factor=2, mode='bilinear',
                              align_corners=True)
            proj, _ = conv_bn(f'fusion{i}_project', CH, CH, 1)
            out = proj(x)
        proj, bn = conv_bn('project', CH, CH, 3, 1, 1, bias=False, bn=True)
        out = F.relu(bn(proj(out)))
        cls_conv = tnn.Conv2d(CH, 4, 1)
        with torch.no_grad():
            cls_conv.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(p['cls']['conv_seg']['kernel']),
                (3, 2, 0, 1)).copy()))
            cls_conv.bias.copy_(torch.from_numpy(
                np.asarray(p['cls']['conv_seg']['bias']).copy()))
        out_t = cls_conv(out)

    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=2e-3)
