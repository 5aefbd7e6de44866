"""Golden numeric parity: flax bricks vs hand-built torch equivalents with
transplanted weights (SURVEY §7.2 acceptance: logit parity on the shared
conv/BN/resize stack)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401
from lednet_tpu.models.layers import BasicBlock, ConvModule
from lednet_tpu.models.ppm import DAPPM


def to_torch_conv(kernel_hwio):
    return torch.from_numpy(np.transpose(np.asarray(kernel_hwio),
                                         (3, 2, 0, 1)).copy())


def rand_bn_state(rng, c):
    return dict(mean=rng.standard_normal(c).astype(np.float32) * 0.1,
                var=rng.uniform(0.5, 1.5, c).astype(np.float32),
                scale=rng.uniform(0.5, 1.5, c).astype(np.float32),
                bias=rng.standard_normal(c).astype(np.float32) * 0.1)


def test_convmodule_matches_torch(rng):
    x = rng.standard_normal((2, 16, 24, 6)).astype(np.float32)
    mod = ConvModule(6, 10, 3, stride=2, padding=1,
                     norm_cfg=dict(type='BN'), act_cfg=dict(type='ReLU'))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    bn = rand_bn_state(rng, 10)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = jax.device_get(variables['params'])
    stats = {'norm': {'bn': {'mean': bn['mean'], 'var': bn['var']}}}
    params['norm']['bn']['scale'] = bn['scale']
    params['norm']['bn']['bias'] = bn['bias']
    ours = mod.apply({'params': params, 'batch_stats': stats},
                     jnp.asarray(x), train=False)

    tconv = tnn.Conv2d(6, 10, 3, stride=2, padding=1, bias=False)
    tbn = tnn.BatchNorm2d(10)
    with torch.no_grad():
        tconv.weight.copy_(to_torch_conv(params['conv']['kernel']))
        tbn.weight.copy_(torch.from_numpy(bn['scale']))
        tbn.bias.copy_(torch.from_numpy(bn['bias']))
        tbn.running_mean.copy_(torch.from_numpy(bn['mean']))
        tbn.running_var.copy_(torch.from_numpy(bn['var']))
    tbn.eval()
    ref = F.relu(tbn(tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))))
    ref = ref.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_basicblock_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    mod = BasicBlock(4, 4, norm_cfg=dict(type='BN'), act_out=True)
    variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['batch_stats'])
    ours = mod.apply({'params': params, 'batch_stats': stats},
                     jnp.asarray(x), train=False)

    def torch_convbn(pname):
        conv = tnn.Conv2d(4, 4, 3, padding=1, bias=False)
        bn = tnn.BatchNorm2d(4)
        with torch.no_grad():
            conv.weight.copy_(to_torch_conv(params[pname]['conv']['kernel']))
            bn.weight.copy_(torch.from_numpy(np.asarray(
                params[pname]['norm']['bn']['scale'])))
            bn.bias.copy_(torch.from_numpy(np.asarray(
                params[pname]['norm']['bn']['bias'])))
            bn.running_mean.copy_(torch.from_numpy(np.asarray(
                stats[pname]['norm']['bn']['mean'])))
            bn.running_var.copy_(torch.from_numpy(np.asarray(
                stats[pname]['norm']['bn']['var'])))
        bn.eval()
        return lambda t: bn(conv(t))

    c1 = torch_convbn('conv1')
    c2 = torch_convbn('conv2')
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.relu(c2(F.relu(c1(t))) + t)
    ref = ref.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_dappm_structure_finite(rng):
    """DAPPM end-to-end sanity (scale branches + hierarchical fusion) — the
    per-op parity is covered by the op tests; here: finite + shape under a
    realistic pyramid input."""
    x = rng.standard_normal((1, 16, 32, 64)).astype(np.float32)
    mod = DAPPM(64, 24, 32, num_scales=5)
    variables = mod.init(jax.random.PRNGKey(2), jnp.asarray(x), train=False)
    out = mod.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (1, 16, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_focal_loss_matches_torchvision_formula(rng):
    """Sigmoid focal loss vs the mmcv/torchvision closed form
    FL = alpha_t (1-p_t)^gamma * BCE, computed independently in torch."""
    import torch
    import torch.nn.functional as F
    from lednet_tpu.models.losses import FocalLoss

    logits = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 8, 8)).astype(np.int32)
    labels[0, 0, :3] = 255  # ignore pixels
    gamma, alpha = 2.0, 0.25

    ours = float(FocalLoss(gamma=gamma, alpha=alpha)(
        jnp.asarray(logits), jnp.asarray(labels)))

    x = torch.from_numpy(logits)
    t = torch.from_numpy(labels.astype(np.int64))
    valid = t != 255
    one_hot = F.one_hot(torch.where(valid, t, torch.zeros_like(t)), 4).float()
    p = torch.sigmoid(x)
    pt = torch.where(one_hot == 1, p, 1 - p)
    alpha_t = torch.where(one_hot == 1, torch.tensor(alpha),
                          torch.tensor(1 - alpha))
    bce = F.binary_cross_entropy_with_logits(x, one_hot, reduction='none')
    focal = alpha_t * (1 - pt) ** gamma * bce
    focal = focal * valid.unsqueeze(-1)
    ref = float(focal.sum() / valid.sum())
    assert np.isclose(ours, ref, atol=1e-5)


def test_criss_cross_attention_matches_ccnet_torch(rng):
    """CCHead (recurrence=1) vs a full torch twin implementing the published
    CCNet formulation (q/k/v projections, -inf on the H-branch diagonal,
    joint softmax over the row+column footprint, gamma-gated residual)."""
    from lednet_tpu.models.decode_heads.context_heads import CCHead

    B, H, W, C = 1, 5, 7, 16
    feats = rng.standard_normal((B, H, W, C)).astype(np.float32)

    head = CCHead(in_channels=C, channels=C, num_classes=2, recurrence=1,
                  dropout_ratio=0.0)
    x = jnp.asarray(feats)
    variables = head.init(jax.random.PRNGKey(0), [x], train=False)
    ours = head.apply(variables, [x], train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])

    def convbnrelu(pp, ss, t):
        m = tnn.Sequential(tnn.Conv2d(t.shape[1], C, 3, 1, 1, bias=False),
                           tnn.BatchNorm2d(C))
        with torch.no_grad():
            m[0].weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(pp['conv']['kernel']), (3, 2, 0, 1)).copy()))
            m[1].weight.copy_(torch.from_numpy(
                np.asarray(pp['norm']['bn']['scale']).copy()))
            m[1].bias.copy_(torch.from_numpy(
                np.asarray(pp['norm']['bn']['bias']).copy()))
            m[1].running_mean.copy_(torch.from_numpy(
                np.asarray(ss['norm']['bn']['mean']).copy()))
            m[1].running_var.copy_(torch.from_numpy(
                np.asarray(ss['norm']['bn']['var']).copy()))
        m.eval()
        with torch.no_grad():
            return F.relu(m(t))

    t = torch.from_numpy(feats.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t = convbnrelu(p['conv0'], s['conv0'], t)
        f = t.permute(0, 2, 3, 1)                     # NHWC
        wq = torch.from_numpy(np.asarray(p['cca_q']['kernel']))
        bq = torch.from_numpy(np.asarray(p['cca_q']['bias']))
        wk = torch.from_numpy(np.asarray(p['cca_k']['kernel']))
        bk = torch.from_numpy(np.asarray(p['cca_k']['bias']))
        wv = torch.from_numpy(np.asarray(p['cca_v']['kernel']))
        bv = torch.from_numpy(np.asarray(p['cca_v']['bias']))
        gamma = float(np.asarray(p['cca_gamma']))
        q = f @ wq + bq
        k = f @ wk + bk
        v = f @ wv + bv
        row = torch.einsum('bhwc,bhvc->bhwv', q, k)
        col = torch.einsum('bhwc,buwc->bhwu', q, k)
        diag = torch.eye(H, dtype=torch.bool)[None, :, None, :]
        col = col.masked_fill(diag, float('-inf'))
        attn = torch.softmax(torch.cat([row, col], dim=-1), dim=-1)
        a_row, a_col = attn[..., :W], attn[..., W:]
        out = torch.einsum('bhwv,bhvc->bhwc', a_row, v) + \
            torch.einsum('bhwu,buwc->bhwc', a_col, v)
        f = f + gamma * out
        t = convbnrelu(p['conv1'], s['conv1'], f.permute(0, 3, 1, 2))
        # FCNHead concat_input tail (reference default): conv_cat([x, out])
        x_in = torch.from_numpy(feats.transpose(0, 3, 1, 2))
        t = convbnrelu(p['conv_cat'], s['conv_cat'],
                       torch.cat([x_in, t], dim=1))
        cls = tnn.Conv2d(C, 2, 1)
        cls.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['cls']['conv_seg']['kernel']), (3, 2, 0, 1)).copy()))
        cls.bias.copy_(torch.from_numpy(
            np.asarray(p['cls']['conv_seg']['bias']).copy()))
        ref = cls(t).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5,
                               rtol=1e-4)
