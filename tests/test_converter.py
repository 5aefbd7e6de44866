"""mmseg2jax converter checks.

1. Round trip: synthesize a torch state_dict covering every unit of a
   DDRNet-ish model — *including BatchNorm running stats* — convert, reload
   the orbax output, and confirm every params leaf AND every batch_stats
   leaf carries the transplanted values with correct layouts.
2. Name-first matching: torch keys emitted in scrambled order with
   canonical names mirroring ours must still land on the right units.
"""
import subprocess
import sys
import os.path as osp

import numpy as np
import torch

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..'))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, 'tools/model_converters'))


def _build(cfg_path):
    import jax
    import jax.numpy as jnp
    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.config import Config
    from lednet_tpu.engine.state import jit_init
    from lednet_tpu.registry import MODELS
    model = MODELS.build(dict(Config.fromfile(str(cfg_path)).model))
    return jit_init(model, jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 3)), train=False)


def _jax_units(variables):
    from mmseg2jax import build_jax_units
    return build_jax_units(variables['params'],
                           variables.get('batch_stats', {}))


def _fabricate_sd(variables, rng, order='natural'):
    """One torch unit per jax unit, emitted under synthetic names whose
    natural-sort order matches the jax units' natural-sort order."""
    from mmseg2jax import _natkey
    units = _jax_units(variables)
    keys = sorted(units, key=lambda t: _natkey('/'.join(t)))
    sd, expected = {}, {}
    inv_role = {'w': 'weight', 'b': 'bias', 'rm': 'running_mean',
                'rv': 'running_var'}
    for i, jk in enumerate(keys):
        for role, (path, shape, is_stat) in units[jk].items():
            arr = rng.standard_normal(shape).astype(np.float32)
            if role == 'rv':
                arr = np.abs(arr) + 0.5
            expected[(path, is_stat)] = arr
            t = arr
            if len(shape) == 4:    # jax HWIO -> torch OIHW
                t = arr.transpose(3, 2, 0, 1)
            elif len(shape) == 2:
                t = arr.T
            sd[f'm{i:04d}.{inv_role.get(role, role)}'] = \
                torch.from_numpy(t.copy())
    return sd, expected


def _convert(cfg, pth, out):
    res = subprocess.run(
        [sys.executable, osp.join(REPO, 'tools/model_converters/mmseg2jax.py'),
         str(cfg), str(pth), str(out)],
        capture_output=True, text=True, timeout=500,
        env=dict(__import__('os').environ, JAX_PLATFORMS='cpu'))
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


def test_mmseg2jax_transplants_params_and_bn_stats(tmp_path):
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(
        "model = dict(type='EncoderDecoder',"
        " backbone=dict(type='DDRNet', channels=8, ppm_channels=16),"
        " decode_head=dict(type='DDRHead', in_channels=32, channels=16,"
        " num_classes=2))\n")
    variables = _build(cfg)
    rng = np.random.default_rng(0)
    sd, expected = _fabricate_sd(variables, rng)
    pth = tmp_path / 'fake.pth'
    torch.save({'state_dict': sd}, str(pth))

    stdout = _convert(cfg, pth, tmp_path / 'converted')
    n_units = len(_jax_units(variables))
    assert f'matched {n_units}/{n_units}' in stdout, stdout

    import jax
    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(
        str((tmp_path / 'converted').resolve()))

    def check(tree, is_stat):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        n = 0
        for path, leaf in flat:
            key = '/'.join(str(getattr(p, 'key', p)) for p in path)
            want = expected[(key, is_stat)]
            np.testing.assert_allclose(np.asarray(leaf), want, atol=1e-6,
                                       err_msg=f'{key} is_stat={is_stat}')
            n += 1
        return n

    assert check(restored['params'], False) > 0
    # the old converter silently left batch_stats at init — these must now
    # be the torch checkpoint's running stats
    assert check(restored['batch_stats'], True) > 0


def test_mmseg2jax_name_match_beats_scrambled_order(tmp_path):
    """Two same-shaped convs whose torch keys arrive in REVERSED order but
    with canonical names matching ours must land by name, not order."""
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(
        "model = dict(type='EncoderDecoder',"
        " backbone=dict(type='FastSCNN'),"
        " decode_head=dict(type='FCNHead', in_channels=128, channels=32,"
        " num_classes=2, in_index=2))\n")
    variables = _build(cfg)
    import jax
    units = _jax_units(variables)

    # fabricate torch keys from the jax paths themselves (canonical match),
    # emitted in reverse natural order
    from mmseg2jax import _natkey
    keys = sorted(units, key=lambda t: _natkey('/'.join(t)))[::-1]
    inv_role = {'w': 'weight', 'b': 'bias', 'rm': 'running_mean',
                'rv': 'running_var'}
    rng = np.random.default_rng(1)
    sd, expected = {}, {}
    for jk in keys:
        tname = '.'.join(t for t in jk if t != 'norm')
        for role, (path, shape, is_stat) in units[jk].items():
            arr = rng.standard_normal(shape).astype(np.float32)
            if role == 'rv':
                arr = np.abs(arr) + 0.5
            expected[(path, is_stat)] = arr
            t = arr
            if len(shape) == 4:
                t = arr.transpose(3, 2, 0, 1)
            elif len(shape) == 2:
                t = arr.T
            sd[f'{tname}.{inv_role.get(role, role)}'] = \
                torch.from_numpy(t.copy())
    pth = tmp_path / 'fake.pth'
    torch.save({'state_dict': sd}, str(pth))

    stdout = _convert(cfg, pth, tmp_path / 'converted')
    n_units = len(units)
    assert f'matched {n_units}/{n_units}' in stdout, stdout

    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(
        str((tmp_path / 'converted').resolve()))
    flat = jax.tree_util.tree_flatten_with_path(restored['params'])[0]
    for path, leaf in flat:
        key = '/'.join(str(getattr(p, 'key', p)) for p in path)
        np.testing.assert_allclose(np.asarray(leaf), expected[(key, False)],
                                   atol=1e-6, err_msg=key)
