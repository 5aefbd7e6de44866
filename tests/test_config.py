"""Config loader tests: the reference's LED_Net config must load unchanged."""
import os

import pytest

from lednet_tpu.config import Config, merge_a_into_b

REF = '/root/reference'


def test_merge_semantics():
    base = dict(model=dict(type='A', backbone=dict(depth=50, stride=1)), lr=0.1)
    child = dict(model=dict(backbone=dict(depth=18)), lr=0.01)
    out = merge_a_into_b(child, base)
    assert out['model']['type'] == 'A'
    assert out['model']['backbone'] == dict(depth=18, stride=1)
    assert out['lr'] == 0.01


def test_merge_delete_key():
    base = dict(head=dict(type='Old', channels=64))
    child = dict(head=dict(_delete_=True, type='New'))
    out = merge_a_into_b(child, base)
    assert out['head'] == dict(type='New')


@pytest.mark.skipif(not os.path.isdir(REF), reason='reference not mounted')
def test_reference_lednet_config_loads():
    cfg = Config.fromfile(
        f'{REF}/configs/LED_Net/LEDNet_80k_cityscapes-1024x1024.py')
    assert cfg.model.type == 'EncoderDecoder'
    assert cfg.model.backbone.type == 'LEDNet'
    assert cfg.model.backbone.channels == 32
    assert cfg.model.decode_head.type == 'LEDHead'
    assert cfg.model.decode_head.in_channels == 128
    assert cfg.model.decode_head.loss_decode[0].min_kept == 131072
    assert cfg.model.decode_head.loss_decode[1].loss_weight == 0.4
    # merged from _base_ chain
    assert cfg.train_pipeline[0].type == 'LoadImageFromFile'
    assert cfg.optimizer.lr == 0.01
    assert cfg.param_scheduler[0].type == 'PolyLR'
    # child file overrides the _base_ schedule's eta_min
    assert cfg.param_scheduler[0].eta_min == 0
    assert cfg.train_dataloader.batch_size == 2


@pytest.mark.skipif(not os.path.isdir(REF), reason='reference not mounted')
def test_reference_ddrnet_pidnet_configs_load():
    cfg = Config.fromfile(
        f'{REF}/configs/ddrnet/ddrnet_23-slim_in1k-pre_2xb6-120k_cityscapes-1024x1024.py')
    assert cfg.model.backbone.type == 'DDRNet'
    cfg = Config.fromfile(
        f'{REF}/configs/pidnet/pidnet-s_2xb6-120k_1024x1024-cityscapes.py')
    assert cfg.model.backbone.type == 'PIDNet'


def test_cfg_options_merge(tmp_path):
    p = tmp_path / 'c.py'
    p.write_text('model = dict(type="M", backbone=dict(depth=50))\nlr = 0.1\n')
    cfg = Config.fromfile(str(p))
    cfg.merge_from_dict({'model.backbone.depth': '18', 'lr': '0.2',
                         'new.key': 'hello'})
    assert cfg.model.backbone.depth == 18
    assert cfg.lr == 0.2
    assert cfg.new.key == 'hello'


def test_base_inheritance(tmp_path):
    (tmp_path / 'base.py').write_text('a = dict(x=1, y=2)\nb = 3\n')
    (tmp_path / 'child.py').write_text("_base_ = ['base.py']\na = dict(y=5)\n")
    cfg = Config.fromfile(str(tmp_path / 'child.py'))
    assert cfg.a.x == 1 and cfg.a.y == 5 and cfg.b == 3
