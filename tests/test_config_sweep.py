"""Config-sweep test (reference ``tests/test_config.py`` style): every config
in configs/ must load and its model must build; a subset also runs a tiny
forward to catch wiring drift."""
import glob
import os.path as osp

import jax
import jax.numpy as jnp
import pytest

import lednet_tpu
from lednet_tpu.config import Config
from lednet_tpu.registry import MODELS

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

lednet_tpu.register_all_modules()

CFG_DIR = osp.join(osp.dirname(__file__), '..', 'configs')
ALL_CONFIGS = sorted(p for p in glob.glob(osp.join(CFG_DIR, '*', '*.py'))
                     if '_base_' not in p)
assert ALL_CONFIGS, 'no configs found'


@pytest.mark.parametrize('cfg_path', ALL_CONFIGS,
                         ids=[osp.basename(p) for p in ALL_CONFIGS])
def test_config_builds(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert 'model' in cfg
    model = MODELS.build(dict(cfg.model))
    assert model is not None
    # required surface for the runner
    assert 'train_dataloader' in cfg and 'val_dataloader' in cfg
    assert 'optim_wrapper' in cfg and 'param_scheduler' in cfg


FORWARD_CONFIGS = [p for p in ALL_CONFIGS
                   if 'lednet' in p or 'ddrnet' in p or 'pidnet' in p]


@pytest.mark.parametrize('cfg_path', FORWARD_CONFIGS,
                         ids=[osp.basename(p) for p in FORWARD_CONFIGS])
def test_config_forward(cfg_path):
    cfg = Config.fromfile(cfg_path)
    model = MODELS.build(dict(cfg.model))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, train=False)
    logits = model.apply(variables, x, method='predict')
    assert logits.shape[0] == 1 and logits.ndim == 4
