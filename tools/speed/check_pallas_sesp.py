"""On-TPU exactness check: fused Pallas SESP block vs an f32-exact pure-jnp
replica of the eval-mode SESP math (run from the repo root on the real chip;
the CPU test suite exercises the fallback path instead — Pallas TPU kernels
cannot run under the forced-CPU conftest).

Pass criterion: rel err <= 1e-5 for every instantiation the flagship model
uses. See lednet_tpu/ops/pallas/sesp_pyramid.py.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax, jax.numpy as jnp
from lednet_tpu.models.espnet import SESP, _dw_shift, _dilation_schedule
from lednet_tpu.ops.pallas.sesp_pyramid import bn_fold, dense_grouped
from lednet_tpu.ops import avg_pool2d

def exact_ref(x, v, Cin, Cout, spatial, stride, k=4):
    """Pure-jnp f32-exact replica of eval-mode SESP."""
    p = v['params']; s = v['batch_stats']
    n = Cout // k
    rates = _dilation_schedule(k, spatial, 7, False)
    s1, b1 = bn_fold(p['proj_1x1']['norm']['bn']['scale'], p['proj_1x1']['norm']['bn']['bias'],
                     s['proj_1x1']['norm']['bn']['mean'], s['proj_1x1']['norm']['bn']['var'])
    wred = dense_grouped(p['proj_1x1']['conv']['kernel'], k) * s1[None]
    red = jnp.einsum('bhwi,io->bhwo', x.astype(jnp.float32), wred, precision='highest') + b1
    a1 = p['proj_1x1']['act']['alpha']
    red = jnp.where(red >= 0, red, a1 * red)
    branches = []
    for i, d in enumerate(rates):
        b = _dw_shift(red, p[f'spp_dw{i}'], d, stride)
        if branches: b = b + branches[-1]
        branches.append(b)
    branches = [_dw_shift(b, p[f'spp_dw_v2_{i}'], d + 1)
                for i, (b, d) in enumerate(zip(branches, rates))]
    merged = jnp.concatenate(branches, -1)
    s2, b2 = bn_fold(p['br_after_cat_norm']['bn']['scale'], p['br_after_cat_norm']['bn']['bias'],
                     s['br_after_cat_norm']['bn']['mean'], s['br_after_cat_norm']['bn']['var'])
    y = merged * s2 + b2
    a2 = p['br_after_cat_act']['alpha']
    y = jnp.where(y >= 0, y, a2 * y)
    s3, b3 = bn_fold(p['conv_1x1_exp']['norm']['bn']['scale'], p['conv_1x1_exp']['norm']['bn']['bias'],
                     s['conv_1x1_exp']['norm']['bn']['mean'], s['conv_1x1_exp']['norm']['bn']['var'])
    wexp = dense_grouped(p['conv_1x1_exp']['conv']['kernel'], k) * s3[None]
    z = jnp.einsum('bhwi,io->bhwo', y, wexp, precision='highest') + b3
    if stride == 2:
        if not spatial:
            z = z + avg_pool2d(x.astype(jnp.float32), 3, 2, 1)
        return z
    if Cin == Cout:
        z = z + x.astype(jnp.float32)
    a3 = p['module_act']['alpha']
    return jnp.where(z >= 0, z, a3 * z)

def check(Cin, Cout, spatial, stride, H, W):
    rngk = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, H, W, Cin)), jnp.float32)
    m = SESP(Cin, Cout, stride=stride, spatial=spatial, dw_impl='pallas',
             down_method='esp' if stride == 2 else 'esp')
    v = jax.jit(lambda: m.init(rngk, x, train=False))()
    # make batch_stats non-trivial
    v = jax.tree.map(lambda a: a, v)
    b = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    a = jax.jit(lambda v, x: exact_ref(x, v, Cin, Cout, spatial, stride))(v, x)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
    print(f"Cin={Cin} Cout={Cout} spatial={spatial} s={stride} {H}x{W}: rel_err={err:.2e}")


errs = []
for args in [(64, 64, True, 1, 90, 160), (64, 64, False, 1, 45, 80),
             (512, 128, False, 1, 12, 20), (64, 64, False, 2, 90, 160)]:
    check(*args)
print('done')
