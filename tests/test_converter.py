"""mmseg2jax converter checks.

1. Round trip: synthesize a torch state_dict covering every unit of a
   DDRNet-ish model — *including BatchNorm running stats* — convert, reload
   the orbax output, and confirm every params leaf AND every batch_stats
   leaf carries the transplanted values with correct layouts.
2. Name-first matching: torch keys emitted in scrambled order with
   canonical names mirroring ours must still land on the right units.
"""
import pytest
import subprocess
import sys
import os.path as osp

import numpy as np
import torch

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

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


def test_mmseg2jax_end_to_end_ddrnet_logit_fidelity(tmp_path):
    """Full pipeline: a synthetic DDRNet ``.pth`` whose tensors come from a
    live *torch* model (torch-native layouts, randomized BN stats) -> CLI
    convert -> orbax restore -> jitted whole-image predict. Logits must
    match the torch mirror's eval forward <1e-4 — the converter-fidelity
    bar the reference's ``tools/model_converters/`` family implies."""
    import jax
    import jax.numpy as jnp
    import torch.nn as tnn
    import torch.nn.functional as F
    sys.path.insert(0, osp.join(REPO, 'tests'))
    from test_ddrnet_parity import TDDRNet, C

    cfg = tmp_path / 'cfg.py'
    cfg.write_text(
        "model = dict(type='EncoderDecoder',"
        " backbone=dict(type='DDRNet', channels=8, ppm_channels=16),"
        " decode_head=dict(type='DDRHead', in_channels=32, channels=16,"
        " num_classes=2))\n")

    gen = torch.Generator().manual_seed(7)

    class THead(tnn.Module):
        """torch mirror of DDRHead eval path (_BaseHead + ClsSeg)."""

        def __init__(self, cin=4 * C, ch=2 * C, ncls=2):
            super().__init__()
            self.pre_bn = tnn.BatchNorm2d(cin)
            self.conv = tnn.Conv2d(cin, ch, 3, padding=1, bias=False)
            self.post_bn = tnn.BatchNorm2d(ch)
            self.cls = tnn.Conv2d(ch, ncls, 1)
            # aux head exists in the param tree (unused in predict)
            self.aux_pre_bn = tnn.BatchNorm2d(cin // 2)
            self.aux_conv = tnn.Conv2d(cin // 2, ch, 3, padding=1, bias=False)
            self.aux_post_bn = tnn.BatchNorm2d(ch)
            self.aux_cls = tnn.Conv2d(ch, ncls, 1)

        def forward(self, final):
            x = self.conv(F.relu(self.pre_bn(final)))
            x = F.relu(self.post_bn(x))
            return self.cls(x)

    tb, th = TDDRNet(), THead()
    with torch.no_grad():
        for mod in (tb, th):
            for p in mod.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
            for m in mod.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.copy_(
                        torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                    m.running_var.copy_(torch.rand(
                        m.running_var.shape, generator=gen) + 0.5)

    def emit_bn(sd, prefix, bn):
        sd[prefix + '.weight'] = bn.weight.detach().clone()
        sd[prefix + '.bias'] = bn.bias.detach().clone()
        sd[prefix + '.running_mean'] = bn.running_mean.detach().clone()
        sd[prefix + '.running_var'] = bn.running_var.detach().clone()

    def emit_convbn(sd, prefix, seq):   # Sequential(conv, bn[, relu])
        sd[prefix + '.conv.weight'] = seq[0].weight.detach().clone()
        emit_bn(sd, prefix + '.norm.bn', seq[1])

    def emit_pre(sd, prefix, seq):      # Sequential(bn, relu, conv) [DAPPM]
        emit_bn(sd, prefix + '.norm.bn', seq[0])
        sd[prefix + '.conv.weight'] = seq[2].weight.detach().clone()

    def emit_block(sd, prefix, blk):
        emit_convbn(sd, prefix + '.conv1', blk.conv1)
        emit_convbn(sd, prefix + '.conv2', blk.conv2)
        if getattr(blk, 'down', None) is not None:
            sd[prefix + '.downsample_conv.weight'] = \
                blk.down[0].weight.detach().clone()
            emit_bn(sd, prefix + '.downsample_norm.bn', blk.down[1])
        if hasattr(blk, 'conv3'):
            emit_convbn(sd, prefix + '.conv3', blk.conv3)

    sd = {}
    B = 'backbone'
    emit_convbn(sd, f'{B}.stem_conv1', tb.stem_conv1)
    emit_convbn(sd, f'{B}.stem_conv2', tb.stem_conv2)
    for i in range(2):
        emit_block(sd, f'{B}.stem_layer1.block{i}', tb.stem_l1[i])
        emit_block(sd, f'{B}.stem_layer2.block{i}', tb.stem_l2[i])
        emit_block(sd, f'{B}.context1.block{i}', tb.ctx1[i])
        emit_block(sd, f'{B}.spatial1.block{i}', tb.sp1[i])
        emit_block(sd, f'{B}.context2.block{i}', tb.ctx2[i])
        emit_block(sd, f'{B}.spatial2.block{i}', tb.sp2[i])
    emit_convbn(sd, f'{B}.compression_1', tb.comp1)
    emit_convbn(sd, f'{B}.down_1', tb.down1)
    emit_convbn(sd, f'{B}.compression_2', tb.comp2)
    emit_convbn(sd, f'{B}.down_2a', tb.down2a)
    emit_convbn(sd, f'{B}.down_2b', tb.down2b)
    emit_block(sd, f'{B}.spatial3.block0', tb.sp3)
    emit_block(sd, f'{B}.context3.block0', tb.ctx3)
    emit_pre(sd, f'{B}.spp.scale0', tb.spp.scale0)
    for i in range(1, 5):
        emit_pre(sd, f'{B}.spp.scale{i}', tb.spp.scale_convs[i - 1])
        emit_pre(sd, f'{B}.spp.process{i - 1}', tb.spp.processes[i - 1])
    emit_pre(sd, f'{B}.spp.compression', tb.spp.compression)
    emit_pre(sd, f'{B}.spp.shortcut', tb.spp.shortcut)

    H = '_decode_head'
    emit_bn(sd, f'{H}.head.conv.norm.bn', th.pre_bn)
    sd[f'{H}.head.conv.conv.weight'] = th.conv.weight.detach().clone()
    emit_bn(sd, f'{H}.head.norm.bn', th.post_bn)
    sd[f'{H}.cls.conv_seg.weight'] = th.cls.weight.detach().clone()
    sd[f'{H}.cls.conv_seg.bias'] = th.cls.bias.detach().clone()
    emit_bn(sd, f'{H}.aux_head.conv.norm.bn', th.aux_pre_bn)
    sd[f'{H}.aux_head.conv.conv.weight'] = th.aux_conv.weight.detach().clone()
    emit_bn(sd, f'{H}.aux_head.norm.bn', th.aux_post_bn)
    sd[f'{H}.aux_cls_seg.weight'] = th.aux_cls.weight.detach().clone()
    sd[f'{H}.aux_cls_seg.bias'] = th.aux_cls.bias.detach().clone()

    pth = tmp_path / 'synth_ddrnet.pth'
    torch.save({'state_dict': sd}, str(pth))

    variables = _build(cfg)
    n_units = len(_jax_units(variables))
    stdout = _convert(cfg, pth, tmp_path / 'converted')
    assert f'matched {n_units}/{n_units}' in stdout, stdout

    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(
        str((tmp_path / 'converted').resolve()))

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    import lednet_tpu
    lednet_tpu.register_all_modules()
    from lednet_tpu.config import Config
    from lednet_tpu.registry import MODELS
    model = MODELS.build(dict(Config.fromfile(str(cfg)).model))
    ours = model.apply(
        {'params': restored['params'],
         'batch_stats': restored['batch_stats']},
        jnp.asarray(x), method='predict')

    tb.eval(), th.eval()
    with torch.no_grad():
        _, final = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        logit = th(final)
        ref = F.interpolate(logit, (64, 96), mode='bilinear',
                            align_corners=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)
