"""mmseg2jax converter smoke: synthesize a torch state_dict whose tensor
shapes match our DDRNet-ish model, convert, and confirm the matched params
land with correct layouts."""
import subprocess
import sys
import os.path as osp

import numpy as np
import torch


def test_mmseg2jax_roundtrip(tmp_path):
    repo = osp.abspath(osp.join(osp.dirname(__file__), '..'))
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(
        "model = dict(type='EncoderDecoder',"
        " backbone=dict(type='DDRNet', channels=8, ppm_channels=16),"
        " decode_head=dict(type='DDRHead', in_channels=32, channels=16,"
        " num_classes=2))\n")

    # build the jax model to learn its shapes, then fabricate a torch sd
    sys.path.insert(0, repo)
    import jax
    import jax.numpy as jnp
    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.config import Config
    from lednet_tpu.engine.state import jit_init
    from lednet_tpu.registry import MODELS
    model = MODELS.build(dict(Config.fromfile(str(cfg)).model))
    variables = jit_init(model, jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    sd = {}
    rng = np.random.default_rng(0)
    for i, leaf in enumerate(jax.tree.leaves(variables['params'])):
        arr = rng.standard_normal(leaf.shape).astype(np.float32)
        if arr.ndim == 4:   # jax HWIO -> torch OIHW
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2:
            arr = arr.T
        sd[f'param_{i}'] = torch.from_numpy(arr)
    pth = tmp_path / 'fake.pth'
    torch.save({'state_dict': sd}, str(pth))

    out = subprocess.run(
        [sys.executable, osp.join(repo, 'tools/model_converters/mmseg2jax.py'),
         str(cfg), str(pth), str(tmp_path / 'converted')],
        capture_output=True, text=True, timeout=500,
        env=dict(__import__('os').environ,
                 JAX_PLATFORMS='cpu'))
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'matched' in out.stdout
    n_leaves = len(jax.tree.leaves(variables['params']))
    # every tensor matches by construction
    assert f'matched {n_leaves}/{n_leaves}' in out.stdout, out.stdout
