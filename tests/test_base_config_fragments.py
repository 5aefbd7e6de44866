"""Every ``configs/_base_/datasets/*.py`` and ``configs/_base_/schedules/*.py``
fragment must load standalone and name only registered components — these
fragments are mostly consumed via ``_base_`` inheritance, so a typo in a
rarely-inherited one (e.g. synapse, refuge) would otherwise go unnoticed
(reference corpus: ``configs/_base_/`` in mmsegmentation)."""
import glob
import os.path as osp

import pytest

import lednet_tpu
from lednet_tpu.config import Config
from lednet_tpu.registry import DATASETS, METRICS, MODELS, TRANSFORMS

lednet_tpu.register_all_modules()

CFG_DIR = osp.join(osp.dirname(__file__), '..', 'configs', '_base_')
DATASET_CFGS = sorted(glob.glob(osp.join(CFG_DIR, 'datasets', '*.py')))
SCHEDULE_CFGS = sorted(glob.glob(osp.join(CFG_DIR, 'schedules', '*.py')))
MODEL_CFGS = sorted(glob.glob(osp.join(CFG_DIR, 'models', '*.py')))
assert DATASET_CFGS and SCHEDULE_CFGS and MODEL_CFGS


def test_model_fragment_inventory():
    # the reference _base_/models corpus has 51 skeletons (SURVEY §2.11)
    assert len(MODEL_CFGS) >= 51


def _pipeline_types(pipeline):
    """Flatten transform type names, descending into TestTimeAug branches."""
    names = []
    for t in pipeline:
        names.append(t['type'])
        if t['type'] == 'Albu':  # inner names are albumentations classes
            continue
        for branch in t.get('transforms', []) or []:
            sub = branch if isinstance(branch, list) else [branch]
            names.extend(s['type'] for s in sub)
    return names


def _dataset_types(ds_cfg):
    """Dataset type plus any wrapped child datasets (Concat/Repeat/mix)."""
    out = [ds_cfg['type']]
    for child in ds_cfg.get('datasets', []):
        out.extend(_dataset_types(child))
    if isinstance(ds_cfg.get('dataset'), dict):
        out.extend(_dataset_types(ds_cfg['dataset']))
    return out


def _dataset_pipelines(ds_cfg):
    """Every pipeline in a dataset cfg, descending into Concat/Repeat/mix
    children (pascal_voc12_aug.py keeps its train pipeline inside
    ConcatDataset's children)."""
    out = []
    if ds_cfg.get('pipeline'):
        out.append(ds_cfg['pipeline'])
    for child in ds_cfg.get('datasets', []):
        out.extend(_dataset_pipelines(child))
    if isinstance(ds_cfg.get('dataset'), dict):
        out.extend(_dataset_pipelines(ds_cfg['dataset']))
    return out


@pytest.mark.parametrize('cfg_path', DATASET_CFGS,
                         ids=[osp.basename(p) for p in DATASET_CFGS])
def test_dataset_fragment_resolves(cfg_path):
    cfg = Config.fromfile(cfg_path)
    for key in ('train_dataloader', 'val_dataloader', 'test_dataloader',
                'val_evaluator', 'test_evaluator'):
        assert key in cfg, f'{key} missing'
    for loader_key in ('train_dataloader', 'val_dataloader'):
        ds = cfg[loader_key]['dataset']
        for name in _dataset_types(ds):
            assert name in DATASETS, f'unregistered dataset {name}'
        pipelines = _dataset_pipelines(ds)
        assert pipelines, f'no pipeline found in {loader_key}'
        for pipe in pipelines:
            for name in _pipeline_types(pipe):
                assert name in TRANSFORMS, f'unregistered transform {name}'
    ev = cfg['val_evaluator']
    ev_list = ev if isinstance(ev, list) else [ev]
    for e in ev_list:
        assert e['type'] in METRICS, f'unregistered metric {e["type"]}'
    # tta_pipeline, when present, must also resolve
    for name in _pipeline_types(cfg.get('tta_pipeline', [])):
        assert name in TRANSFORMS, f'unregistered TTA transform {name}'


# Partial skeletons that cannot build standalone: resnet50-d8.py is the
# shared encoder base (heads come from the inheriting fragment) and
# vpd_sd.py mirrors the reference in omitting the decode head (the full
# config adds it; the VPD backbone itself is gated on latent-diffusion).
PARTIAL_MODEL_CFGS = {'resnet50-d8.py', 'vpd_sd.py'}


@pytest.mark.parametrize('cfg_path', MODEL_CFGS,
                         ids=[osp.basename(p) for p in MODEL_CFGS])
def test_model_fragment_builds(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert 'model' in cfg
    if osp.basename(cfg_path) in PARTIAL_MODEL_CFGS:
        for key in ('backbone', 'data_preprocessor'):
            sub = cfg.model.get(key)
            if isinstance(sub, dict) and 'type' in sub:
                scoped = sub['type'].rsplit('.', 1)[-1]
                assert (sub['type'] in MODELS._module_dict
                        or scoped in MODELS._module_dict)
        return
    model = MODELS.build(dict(cfg.model))
    assert model is not None


@pytest.mark.parametrize('cfg_path', SCHEDULE_CFGS,
                         ids=[osp.basename(p) for p in SCHEDULE_CFGS])
def test_schedule_fragment_resolves(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert cfg['optim_wrapper']['optimizer']['type'] in ('SGD', 'AdamW')
    scheds = cfg['param_scheduler']
    assert isinstance(scheds, list) and scheds
    end = scheds[-1]['end']
    assert cfg['train_cfg']['max_iters'] == end
    assert cfg['default_hooks']['checkpoint']['interval'] > 0
