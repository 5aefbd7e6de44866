"""CARAFE torch transplant parity.

Torch mirror of reference ``tools/speed/model_utils_speed.py:610-653``:
1x1 channel compressor -> encoder conv predicting S^2*K^2 reassembly
kernels -> pixel_shuffle to the upsampled grid -> per-pixel softmax over
K^2 -> unfold neighborhoods -> matmul reassembly -> pixel_shuffle -> 1x1
out conv. Pins the kernel-major channel layout so torch-trained encoder
weights transplant unchanged.
"""
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

INC, OUTC, K, UP, CP = 16, 8, 3, 2, 4


class TCARAFE(tnn.Module):
    def __init__(self):
        super().__init__()
        self.down = tnn.Conv2d(INC, INC // CP, 1)
        self.encoder = tnn.Conv2d(INC // CP, UP ** 2 * K ** 2, K, 1, K // 2)
        self.out = tnn.Conv2d(INC, OUTC, 1)

    def forward(self, x):
        N, C, H, W = x.size()
        kt = F.pixel_shuffle(self.encoder(self.down(x)), UP)
        kt = F.softmax(kt, dim=1)
        kt = kt.unfold(2, UP, step=UP).unfold(3, UP, step=UP)
        kt = kt.reshape(N, K ** 2, H, W, UP ** 2).permute(0, 2, 3, 1, 4)
        xp = F.pad(x, pad=(K // 2,) * 4)
        xp = xp.unfold(2, K, step=1).unfold(3, K, step=1)
        xp = xp.reshape(N, C, H, W, -1).permute(0, 2, 3, 1, 4)
        out = torch.matmul(xp, kt).reshape(N, H, W, -1).permute(0, 3, 1, 2)
        return self.out(F.pixel_shuffle(out, UP))


def test_carafe_full_parity(rng):
    model = MODELS.build(dict(type='CARAFE', inC=INC, outC=OUTC,
                              kernel_size=K, up_factor=UP, cp_rate=CP))
    x = rng.standard_normal((2, 7, 9, INC)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.1)
    params = jax.tree.map(rnd, variables['params'])
    out_j = model.apply({'params': params}, jnp.asarray(x), train=False)

    p = jax.device_get(params)
    t = TCARAFE()
    with torch.no_grad():
        for dst, src in ((t.down, p['comp']['conv']),
                         (t.encoder, p['content']),
                         (t.out, p['out_proj']['conv'])):
            dst.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(src['kernel']), (3, 2, 0, 1)).copy()))
            dst.bias.copy_(torch.from_numpy(np.asarray(src['bias']).copy()))
        out_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert out_j.shape == (2, 14, 18, OUTC)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)
