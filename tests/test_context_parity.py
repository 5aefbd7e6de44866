"""Numeric torch-parity for the context-head math (reference
``ema_head.py`` EMAModule and ``da_head.py`` CAM), plus semantic checks of
the new reference-faithful head structure (EMA bases buffer updates, ISA
centered padding identity, CCA weight sharing across recurrences)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import lednet_tpu

lednet_tpu.register_all_modules()

from lednet_tpu.models.decode_heads.context_heads import (  # noqa: E402
    cam_attention, ema_iterate)
from lednet_tpu.registry import MODELS  # noqa: E402

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_ema_iterate_matches_torch(rng):
    B, N, C, K, stages = 2, 40, 8, 5, 3
    feats = rng.standard_normal((B, N, C)).astype(np.float32)
    bases0 = rng.standard_normal((B, K, C)).astype(np.float32)
    bases0 /= np.linalg.norm(bases0, axis=-1, keepdims=True)

    # torch restatement of EMAModule.forward (ema_head.py:45-66), which
    # works in (B, C, N)/(B, C, K) layout
    tfeats = torch.from_numpy(feats.transpose(0, 2, 1))        # (B,C,N)
    tbases = torch.from_numpy(bases0.transpose(0, 2, 1))       # (B,C,K)
    with torch.no_grad():
        for _ in range(stages):
            attention = torch.einsum('bcn,bck->bnk', tfeats, tbases)
            attention = F.softmax(attention, dim=2)
            attention_normed = F.normalize(attention, dim=1, p=1)
            tbases = torch.einsum('bcn,bnk->bck', tfeats, attention_normed)
            tbases = F.normalize(tbases, dim=1, p=2)
    recon_ref = torch.einsum('bck,bnk->bcn', tbases, attention)

    bases, attn = ema_iterate(jnp.asarray(feats), jnp.asarray(bases0), stages)
    recon = jnp.einsum('bnk,bkc->bnc', attn, bases)
    np.testing.assert_allclose(np.asarray(bases),
                               tbases.numpy().transpose(0, 2, 1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(recon),
                               recon_ref.numpy().transpose(0, 2, 1),
                               atol=1e-5)


def test_cam_attention_matches_torch(rng):
    B, N, C = 2, 30, 6
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    # da_head.py CAM forward, (B, C, N) layout
    t = torch.from_numpy(x.transpose(0, 2, 1))
    energy = torch.bmm(t, t.transpose(1, 2))
    energy_new = torch.max(energy, -1, keepdim=True)[0].expand_as(
        energy) - energy
    attention = F.softmax(energy_new, dim=-1)
    ref = torch.bmm(attention, t)
    ours = cam_attention(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 1), atol=1e-5)


def test_ema_bases_buffer_updates_in_train_mode():
    head = MODELS.build(dict(type='EMAHead', in_channels=16, channels=8,
                             ema_channels=8, num_bases=4, num_stages=2,
                             num_classes=3, in_index=0, dropout_ratio=0.0))
    feats = [jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 16)), jnp.float32)]
    variables = head.init({'params': jax.random.PRNGKey(0)},
                          feats, train=False)
    before = np.asarray(variables['batch_stats']['bases'])
    # bases stay put in eval mode
    _, state = head.apply(variables, feats, train=False,
                          mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(state['batch_stats']['bases']),
                               before)
    # and move under train (momentum EMA toward the batch-mean bases)
    _, state = head.apply(variables, feats, train=True,
                          mutable=['batch_stats'],
                          rngs={'dropout': jax.random.PRNGKey(1)})
    after = np.asarray(state['batch_stats']['bases'])
    assert not np.allclose(after, before)
    # updated buffer rows stay L2-normalized-ish mixtures of unit vectors
    assert np.all(np.linalg.norm(after, axis=-1) < 1.5)


def test_cca_weights_shared_across_recurrence():
    head = MODELS.build(dict(type='CCHead', in_channels=16, channels=16,
                             num_classes=3, in_index=0, recurrence=2,
                             dropout_ratio=0.0))
    feats = [jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 8, 16)), jnp.float32)]
    variables = head.init({'params': jax.random.PRNGKey(0)},
                          feats, train=False)
    names = [k for k in variables['params'] if k.startswith('cca')]
    # one shared module: cca_q/k/v (+ scalar gamma), not per-recurrence sets
    assert sorted(names) == ['cca_gamma', 'cca_k', 'cca_q', 'cca_v']


def test_isa_centered_padding_even_sizes():
    # H=W=8 with down_factor (3, 3) forces pad 1; the reference centers it
    head = MODELS.build(dict(type='ISAHead', in_channels=8, channels=8,
                             isa_channels=4, down_factor=(3, 3),
                             num_classes=2, in_index=0, dropout_ratio=0.0))
    feats = [jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 8, 8)), jnp.float32)]
    variables = head.init({'params': jax.random.PRNGKey(0)},
                          feats, train=False)
    out = head.apply(variables, feats, train=False)
    assert out.shape == (1, 8, 8, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_ocr_head_matches_torch(rng):
    """Full OCRHead vs a faithful torch twin of reference ``ocr_head.py``
    (spatial-softmax gather + ObjectAttentionBlock with normed 2-conv q/k
    projections) with transplanted weights."""
    import torch.nn as tnn
    from lednet_tpu.models.decode_heads.uper_ocr import OCRHead

    B, H, W, C0, C, OC, K = 1, 6, 8, 12, 16, 8, 4
    feats = rng.standard_normal((B, H, W, C0)).astype(np.float32)
    prev = rng.standard_normal((B, H, W, K)).astype(np.float32)

    head = OCRHead(in_channels=C0, channels=C, ocr_channels=OC,
                   num_classes=K, dropout_ratio=0.0)
    variables = head.init(jax.random.PRNGKey(0), [jnp.asarray(feats)],
                          jnp.asarray(prev), train=False)
    ours = head.apply(variables, [jnp.asarray(feats)], jnp.asarray(prev),
                      train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])

    def cm(pp, ss, in_ch, out_ch, k, relu=True):
        pad = k // 2
        mod = tnn.Sequential(
            tnn.Conv2d(in_ch, out_ch, k, 1, pad, bias=False),
            tnn.BatchNorm2d(out_ch))
        with torch.no_grad():
            mod[0].weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(pp['conv']['kernel']), (3, 2, 0, 1)).copy()))
            mod[1].weight.copy_(torch.from_numpy(
                np.asarray(pp['norm']['bn']['scale'])))
            mod[1].bias.copy_(torch.from_numpy(
                np.asarray(pp['norm']['bn']['bias'])))
            mod[1].running_mean.copy_(torch.from_numpy(
                np.asarray(ss['norm']['bn']['mean'])))
            mod[1].running_var.copy_(torch.from_numpy(
                np.asarray(ss['norm']['bn']['var'])))
        mod.eval()
        return (lambda t: F.relu(mod(t))) if relu else mod

    t = torch.from_numpy(feats.transpose(0, 3, 1, 2))
    with torch.no_grad():
        fx = cm(p['bottleneck'], s['bottleneck'], C0, C, 3)(t)
        # SpatialGatherModule: softmax over pixels per class
        probs = torch.from_numpy(prev.transpose(0, 3, 1, 2))
        pr = F.softmax(probs.reshape(B, K, -1), dim=2)
        px = fx.reshape(B, C, -1).permute(0, 2, 1)
        regions = torch.matmul(pr, px)                 # (B, K, C)
        reg_map = regions.permute(0, 2, 1).unsqueeze(3)  # (B, C, K, 1)

        oc = p['object_context']
        ocs = s['object_context']
        q = cm(oc['query_project0'], ocs['query_project0'], C, OC, 1)(fx)
        q = cm(oc['query_project1'], ocs['query_project1'], OC, OC, 1)(q)
        kk = cm(oc['key_project0'], ocs['key_project0'], C, OC, 1)(reg_map)
        kk = cm(oc['key_project1'], ocs['key_project1'], OC, OC, 1)(kk)
        v = cm(oc['value_project0'], ocs['value_project0'], C, OC, 1)(reg_map)
        qf = q.reshape(B, OC, -1).permute(0, 2, 1)     # (B, HW, OC)
        kf = kk.reshape(B, OC, -1)                     # (B, OC, K)
        vf = v.reshape(B, OC, -1).permute(0, 2, 1)     # (B, K, OC)
        sim = torch.matmul(qf, kf) * OC ** -0.5
        ctx = torch.matmul(F.softmax(sim, dim=-1), vf)
        ctx = ctx.permute(0, 2, 1).reshape(B, OC, H, W)
        ctx = cm(oc['out_project0'], ocs['out_project0'], OC, C, 1)(ctx)

        out = cm(p['project'], s['project'], 2 * C, C, 1)(
            torch.cat([ctx, fx], dim=1))
        cls = tnn.Conv2d(C, K, 1)
        cls.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['cls']['conv_seg']['kernel']), (3, 2, 0, 1)).copy()))
        cls.bias.copy_(torch.from_numpy(
            np.asarray(p['cls']['conv_seg']['bias'])))
        ref = cls(out)

    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
        atol=5e-5, rtol=1e-4)


def test_nmf_matches_torch(rng):
    """_nmf vs a torch restatement of reference ``ham_head.py`` NMF2D
    (local_inference + compute_coef + reconstruction, inv_t=1) with the
    same injected bases."""
    from lednet_tpu.models.decode_heads.ham_head import _nmf

    B, C, N, R, steps = 2, 12, 30, 5, 6
    x = np.abs(rng.standard_normal((B, C, N))).astype(np.float32)
    bases0 = np.abs(rng.standard_normal((B, C, R))).astype(np.float32)
    bases0 /= np.linalg.norm(bases0, axis=1, keepdims=True)

    tx = torch.from_numpy(x)
    tb = torch.from_numpy(bases0)
    with torch.no_grad():
        coef = torch.bmm(tx.transpose(1, 2), tb)
        coef = F.softmax(1 * coef, dim=-1)          # NMF2D inv_t == 1
        for _ in range(steps):
            numer = torch.bmm(tx.transpose(1, 2), tb)
            denom = coef.bmm(tb.transpose(1, 2).bmm(tb))
            coef = coef * numer / (denom + 1e-6)
            numer = torch.bmm(tx, coef)
            denom = tb.bmm(coef.transpose(1, 2).bmm(coef))
            tb = tb * numer / (denom + 1e-6)
        numer = torch.bmm(tx.transpose(1, 2), tb)
        denom = coef.bmm(tb.transpose(1, 2).bmm(tb))
        coef = coef * numer / (denom + 1e-6)
        recon_ref = torch.bmm(tb, coef.transpose(1, 2)).numpy()

    recon = _nmf(jnp.asarray(x), R, steps, bases0=jnp.asarray(bases0))
    np.testing.assert_allclose(np.asarray(recon), recon_ref, atol=1e-4,
                               rtol=1e-4)


def test_msca_block_matches_torch(rng):
    """MSCABlock vs a faithful torch twin of reference ``mscan.py``
    (MSCAAttention strip convs, MSCASpatialAttention inner shortcut,
    layer-scaled residuals, conv-Mlp with mid-dwconv)."""
    import torch.nn as tnn
    from lednet_tpu.models.backbones.mscan import MSCABlock

    B, H, W, C = 1, 8, 10, 8
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)

    blk = MSCABlock(C, mlp_ratio=2.0)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    ours = blk.apply(variables, jnp.asarray(x), train=False)

    def conv(src, t, groups=1):
        w = torch.from_numpy(np.transpose(
            np.asarray(src['kernel']), (3, 2, 0, 1)).copy())
        b = torch.from_numpy(np.asarray(src['bias']))
        kh, kw = w.shape[2], w.shape[3]
        return F.conv2d(t, w, b, padding=(kh // 2, kw // 2), groups=groups)

    def bn(src, srs, t):
        return F.batch_norm(
            t, torch.from_numpy(np.asarray(srs['bn']['mean'])),
            torch.from_numpy(np.asarray(srs['bn']['var'])),
            torch.from_numpy(np.asarray(src['bn']['scale'])),
            torch.from_numpy(np.asarray(src['bn']['bias'])), False, 0.1,
            1e-5)

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        hn = bn(p['norm1'], s['norm1'], t)
        h = F.gelu(conv(p['proj_1'], hn))
        # MSCAAttention
        attn = conv(p['attn']['conv0'], h, groups=C)
        total = attn
        for i in range(3):
            a = conv(p['attn'][f'conv{i + 1}_1'], attn, groups=C)
            a = conv(p['attn'][f'conv{i + 1}_2'], a, groups=C)
            total = total + a
        mixed = conv(p['attn']['conv_mix'], total) * h
        h = conv(p['proj_2'], mixed) + hn          # inner shortcut
        ls1 = torch.from_numpy(np.asarray(p['layer_scale_1']))
        t2 = t + ls1[None, :, None, None] * h
        hn2 = bn(p['norm2'], s['norm2'], t2)
        m = conv(p['fc1'], hn2)
        m = conv(p['dw'], m, groups=m.shape[1])
        m = F.gelu(m)
        m = conv(p['fc2'], m)
        ls2 = torch.from_numpy(np.asarray(p['layer_scale_2']))
        ref = t2 + ls2[None, :, None, None] * m

    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-5, rtol=1e-4)


def test_resnest_splat_bottleneck_matches_torch(rng):
    """ResNeSt _SplitAttnBottleneck vs a torch twin of reference
    ``resnest.py`` (SplitAttentionConv2d at stride 1, rsoftmax over radix,
    avd avg-pool carrying the stride, avg-down shortcut)."""
    import torch.nn as tnn
    from lednet_tpu.models.backbones.resnext import _SplitAttnBottleneck

    B, H, W = 1, 8, 8
    IN, CH, R = 16, 8, 2
    x = rng.standard_normal((B, H, W, IN)).astype(np.float32)

    blk = _SplitAttnBottleneck(IN, CH, stride=2, downsample=True)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    ours = blk.apply(variables, jnp.asarray(x), train=False)

    def cm(src, srs, t, groups=1, relu=True, k=None, dil=1):
        w = torch.from_numpy(np.transpose(
            np.asarray(src['conv']['kernel']), (3, 2, 0, 1)).copy())
        kh = w.shape[2]
        out = F.conv2d(t, w, None, padding=(kh // 2) * dil, dilation=dil,
                       groups=groups)
        out = F.batch_norm(
            out, torch.from_numpy(np.asarray(srs['norm']['bn']['mean'])),
            torch.from_numpy(np.asarray(srs['norm']['bn']['var'])),
            torch.from_numpy(np.asarray(src['norm']['bn']['scale'])),
            torch.from_numpy(np.asarray(src['norm']['bn']['bias'])),
            False, 0.1, 1e-5)
        return F.relu(out) if relu else out

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out = cm(p['conv1'], s['conv1'], t)
        out = cm(p['conv2'], s['conv2'], out, groups=R)
        splits = out.view(B, R, CH, *out.shape[2:])
        gap = splits.sum(1)
        gap = F.adaptive_avg_pool2d(gap, 1)
        gap = cm(p['fc1'], s['fc1'], gap)
        w2 = torch.from_numpy(np.transpose(
            np.asarray(p['fc2']['kernel']), (3, 2, 0, 1)).copy())
        b2 = torch.from_numpy(np.asarray(p['fc2']['bias']))
        atten = F.conv2d(gap, w2, b2)
        # rsoftmax, groups=1: softmax over radix
        atten = atten.view(B, 1, R, -1).transpose(1, 2)
        atten = F.softmax(atten, dim=1).reshape(B, -1).view(B, R, CH, 1, 1)
        out = torch.sum(atten * splits, dim=1)
        out = F.avg_pool2d(out, 3, 2, padding=1)       # avd layer
        out = cm(p['conv3'], s['conv3'], out, relu=False)
        # avg-down shortcut: AvgPool(2,2) then 1x1 conv + BN
        idt = F.avg_pool2d(t, 2, 2, padding=0)
        wd = torch.from_numpy(np.transpose(
            np.asarray(p['downsample_conv']['kernel']), (3, 2, 0, 1)).copy())
        idt = F.conv2d(idt, wd)
        idt = F.batch_norm(
            idt,
            torch.from_numpy(np.asarray(s['downsample_norm']['bn']['mean'])),
            torch.from_numpy(np.asarray(s['downsample_norm']['bn']['var'])),
            torch.from_numpy(np.asarray(p['downsample_norm']['bn']['scale'])),
            torch.from_numpy(np.asarray(p['downsample_norm']['bn']['bias'])),
            False, 0.1, 1e-5)
        ref = F.relu(out + idt)

    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-5, rtol=1e-4)
