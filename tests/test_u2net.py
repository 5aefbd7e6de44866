"""U^2-Net: RSU/RSU4F torch-twin parity (transplanted weights) and full-net
side-output contract."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.backbones.u2net import RSU, RSU4F, U2Net

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


class TREBN(tnn.Module):
    def __init__(self, cin, cout, d=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=d, dilation=d)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _copy_rebn(dst: TREBN, p, s):
    with torch.no_grad():
        dst.conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['conv']['kernel']), (3, 2, 0, 1)).copy()))
        dst.conv.bias.copy_(torch.from_numpy(
            np.asarray(p['conv']['bias']).copy()))
        dst.bn.weight.copy_(torch.from_numpy(
            np.asarray(p['bn']['scale']).copy()))
        dst.bn.bias.copy_(torch.from_numpy(np.asarray(p['bn']['bias']).copy()))
        dst.bn.running_mean.copy_(torch.from_numpy(
            np.asarray(s['bn']['mean']).copy()))
        dst.bn.running_var.copy_(torch.from_numpy(
            np.asarray(s['bn']['var']).copy()))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode='bilinear',
                         align_corners=False)


def test_rsu4_matches_torch(rng):
    cin, mid, cout = 8, 4, 8
    x = rng.standard_normal((1, 17, 21, cin)).astype(np.float32)  # odd dims
    mod = RSU(4, mid, cout)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = mod.apply(variables, jnp.asarray(x), train=False)
    p, s = jax.device_get((variables['params'], variables['batch_stats']))

    tw = {name: TREBN(cin if name == 'rebnconvin' else
                      (cout if name == 'rebnconv1' else
                       (2 * mid if name.endswith('d') and name != 'rebnconv1d'
                        else mid)),
                      cout if name in ('rebnconvin', 'rebnconv1d') else mid,
                      d=2 if name == 'rebnconv4' else 1)
          for name in ['rebnconvin', 'rebnconv1', 'rebnconv2', 'rebnconv3',
                       'rebnconv4', 'rebnconv3d', 'rebnconv2d', 'rebnconv1d']}
    # fix input channel counts that the comprehension can't express
    tw['rebnconv1'] = TREBN(cout, mid)
    tw['rebnconv2'] = TREBN(mid, mid)
    tw['rebnconv3'] = TREBN(mid, mid)
    tw['rebnconv1d'] = TREBN(2 * mid, cout)
    for name, m in tw.items():
        _copy_rebn(m, p[name], s[name])
        m.eval()

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
    with torch.no_grad():
        hxin = tw['rebnconvin'](t)
        h1 = tw['rebnconv1'](hxin)
        h2 = tw['rebnconv2'](pool(h1))
        h3 = tw['rebnconv3'](pool(h2))
        h4 = tw['rebnconv4'](h3)
        d3 = tw['rebnconv3d'](torch.cat([h4, h3], 1))
        d2 = tw['rebnconv2d'](torch.cat([_up_like(d3, h2), h2], 1))
        d1 = tw['rebnconv1d'](torch.cat([_up_like(d2, h1), h1], 1))
        ref = d1 + hxin
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-3)


def test_rsu4f_matches_torch(rng):
    cin, mid, cout = 8, 4, 8
    x = rng.standard_normal((1, 12, 16, cin)).astype(np.float32)
    mod = RSU4F(mid, cout)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = mod.apply(variables, jnp.asarray(x), train=False)
    p, s = jax.device_get((variables['params'], variables['batch_stats']))

    spec = dict(rebnconvin=(cin, cout, 1), rebnconv1=(cout, mid, 1),
                rebnconv2=(mid, mid, 2), rebnconv3=(mid, mid, 4),
                rebnconv4=(mid, mid, 8), rebnconv3d=(2 * mid, mid, 4),
                rebnconv2d=(2 * mid, mid, 2), rebnconv1d=(2 * mid, cout, 1))
    tw = {k: TREBN(*v) for k, v in spec.items()}
    for name, m in tw.items():
        _copy_rebn(m, p[name], s[name])
        m.eval()
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        hxin = tw['rebnconvin'](t)
        h1 = tw['rebnconv1'](hxin)
        h2 = tw['rebnconv2'](h1)
        h3 = tw['rebnconv3'](h2)
        h4 = tw['rebnconv4'](h3)
        d3 = tw['rebnconv3d'](torch.cat([h4, h3], 1))
        d2 = tw['rebnconv2d'](torch.cat([d3, h2], 1))
        d1 = tw['rebnconv1d'](torch.cat([d2, h1], 1))
        ref = d1 + hxin
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-3)


@pytest.mark.parametrize('small', [True, False])
def test_u2net_outputs(small, rng):
    net = U2Net(small=small)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    outs = net.apply(variables, x, train=False)
    assert len(outs) == 7
    for o in outs:
        assert o.shape == (1, 64, 96, 1)
        v = np.asarray(o)
        assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1
    n_params = sum(v.size for v in jax.tree_util.tree_leaves(
        variables['params']))
    # reference: U2NETP ~1.13M params, U2NET ~44M
    if small:
        assert 0.9e6 < n_params < 1.4e6, n_params
    else:
        assert 40e6 < n_params < 48e6, n_params
