"""End-to-end engine tests on a tiny on-disk pseudo dataset (the reference's
fixture style, SURVEY.md §4) — runs the full train/val/resume cycle on the
8-device virtual CPU mesh."""
import os

import cv2
import numpy as np
import pytest

from lednet_tpu.config import Config
from lednet_tpu.engine.runner import Runner
import lednet_tpu  # noqa: F401

lednet_tpu.register_all_modules()


@pytest.fixture
def pseudo_dataset(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / 'JPEGImages'
    ann_dir = tmp_path / 'SegmentationClassPNG'
    img_dir.mkdir()
    ann_dir.mkdir()
    names = []
    for i in range(4):
        img = rng.integers(0, 255, (40, 56, 3), np.uint8)
        ann = rng.integers(0, 2, (40, 56), np.uint8)
        cv2.imwrite(str(img_dir / f'im{i}.png'), img)
        cv2.imwrite(str(ann_dir / f'im{i}.png'), ann)
        names.append(f'im{i}')
    (tmp_path / 'train.txt').write_text('\n'.join(names[:3]))
    (tmp_path / 'val.txt').write_text('\n'.join(names[3:]))
    return tmp_path


def _tiny_cfg(data_root, work_dir):
    crop = (32, 32)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='RandomResize', scale=(112, 48), ratio_range=(0.8, 1.2),
             keep_ratio=True),
        dict(type='RandomCrop', crop_size=crop, cat_max_ratio=0.75),
        dict(type='RandomFlip', prob=0.5),
        dict(type='PhotoMetricDistortion'),
        dict(type='PackSegInputs'),
    ]
    test_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='PackSegInputs'),
    ]
    dataset = dict(type='PascalVOCDataset', data_root=str(data_root),
                   data_prefix=dict(img_path='JPEGImages',
                                    seg_map_path='SegmentationClassPNG'))
    return Config(dict(
        model=dict(
            type='EncoderDecoder',
            data_preprocessor=dict(type='SegDataPreProcessor', size=crop,
                                   mean=[123.675, 116.28, 103.53],
                                   std=[58.395, 57.12, 57.375],
                                   bgr_to_rgb=True, pad_val=0, seg_pad_val=255),
            backbone=dict(type='LEDNet', channels=8, ppm_channels=32),
            decode_head=dict(type='LEDHead', in_channels=32, channels=16,
                             dropout_ratio=0.0, num_classes=2,
                             loss_decode=[
                                 dict(type='OhemCrossEntropy', thres=0.9,
                                      min_kept=64, loss_weight=1.0),
                                 dict(type='OhemCrossEntropy', thres=0.9,
                                      min_kept=64, loss_weight=0.4)]),
            test_cfg=dict(mode='whole')),
        train_dataloader=dict(batch_size=1, num_workers=1,
                              sampler=dict(type='InfiniteSampler', shuffle=True),
                              dataset=dict(ann_file='train.txt',
                                           pipeline=pipeline, **dataset)),
        val_dataloader=dict(batch_size=1, num_workers=1,
                            sampler=dict(type='DefaultSampler'),
                            dataset=dict(ann_file='val.txt',
                                         pipeline=test_pipeline, **dataset)),
        val_evaluator=dict(type='IoUMetric', iou_metrics=['mIoU']),
        optim_wrapper=dict(type='OptimWrapper',
                           optimizer=dict(type='SGD', lr=0.01, momentum=0.9,
                                          weight_decay=0.0005)),
        param_scheduler=[dict(type='PolyLR', eta_min=0, power=0.9, begin=0,
                              end=10, by_epoch=False)],
        train_cfg=dict(type='IterBasedTrainLoop', max_iters=3, val_interval=0),
        default_hooks=dict(logger=dict(interval=1),
                           checkpoint=dict(interval=3)),
        work_dir=str(work_dir)))


@pytest.mark.slow
def test_train_val_resume_cycle(pseudo_dataset, tmp_path):
    work_dir = tmp_path / 'work'
    cfg = _tiny_cfg(pseudo_dataset, work_dir)
    runner = Runner(cfg, seed=0)
    assert runner.n_devices == 8  # virtual CPU mesh active
    state = runner.train()
    assert int(state.step) == 3
    # checkpoint written
    assert (work_dir / 'iter_3').is_dir()

    # val produces metrics
    metrics = runner.val()
    assert 'mIoU' in metrics and 'aAcc' in metrics
    assert 0.0 <= metrics['aAcc'] <= 100.0

    # resume continues from the checkpoint
    cfg2 = _tiny_cfg(pseudo_dataset, work_dir)
    cfg2['train_cfg']['max_iters'] = 5
    runner2 = Runner(cfg2, seed=0)
    runner2.init_state(sample_shape=(8, 32, 32, 3))
    state2 = runner2.train(resume=True)
    assert int(state2.step) == 5


def test_lr_schedule_poly():
    from lednet_tpu.engine.optim import build_lr_schedule
    sched = build_lr_schedule([dict(type='PolyLR', eta_min=0, power=0.9,
                                    begin=0, end=100)], 0.01)
    assert abs(sched(0) - 0.01) < 1e-9
    assert sched(50) < 0.01
    assert abs(sched(100)) < 1e-9


@pytest.mark.slow
def test_amp_train_step(pseudo_dataset, tmp_path):
    """bf16 mixed-precision step keeps f32 master weights and finite loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.engine.optim import build_optimizer
    from lednet_tpu.engine.state import create_train_state, make_train_step
    from lednet_tpu.registry import MODELS

    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', channels=8, ppm_channels=32),
        decode_head=dict(type='LEDHead', in_channels=32, channels=16,
                         dropout_ratio=0.0, num_classes=2,
                         loss_decode=[
                             dict(type='OhemCrossEntropy', min_kept=16),
                             dict(type='OhemCrossEntropy', min_kept=16,
                                  loss_weight=0.4)])))
    tx, _ = build_optimizer(dict(optimizer=dict(type='SGD', lr=0.01,
                                                momentum=0.9)))
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, (2, 32, 32)), jnp.int32)
    state = create_train_state(model, tx, dict(inputs=inputs,
                                               gt_seg_map=labels))
    step = make_train_step(model, tx, amp=True)
    state, logs = step(state, inputs, labels)
    assert np.isfinite(float(logs['loss']))
    # master weights stay f32
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_layer_decay_and_paramwise_masks():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.engine.optim import build_optimizer
    params = {
        'patch_embed': {'kernel': jnp.ones((2, 2))},
        'b0_attn': {'qkv': {'kernel': jnp.ones((2, 2))}},
        'b3_attn': {'qkv': {'kernel': jnp.ones((2, 2))}},
        'head': {'conv': {'kernel': jnp.ones((2, 2)),
                          'bias': jnp.ones((2,))}},
        'norm': {'scale': jnp.ones((2,))},
    }
    tx, _ = build_optimizer(dict(
        optimizer=dict(type='AdamW', lr=1.0, weight_decay=0.0),
        constructor='LearningRateDecayOptimizerConstructor',
        paramwise_cfg=dict(decay_rate=0.5, num_layers=4,
                           norm_decay_mult=0.0, bias_decay_mult=0.0)))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # layer 0 (patch_embed) decays most; head (layer num_layers+1) none
    u_embed = abs(float(updates['patch_embed']['kernel'][0, 0]))
    u_b0 = abs(float(updates['b0_attn']['qkv']['kernel'][0, 0]))
    u_b3 = abs(float(updates['b3_attn']['qkv']['kernel'][0, 0]))
    u_head = abs(float(updates['head']['conv']['kernel'][0, 0]))
    assert u_embed < u_b0 < u_b3 < u_head
    np.testing.assert_allclose(u_embed / u_head, 0.5 ** 5, rtol=1e-4)


@pytest.mark.slow
def test_preemption_checkpoint(pseudo_dataset, tmp_path):
    """SIGTERM mid-training saves a resumable checkpoint."""
    import os
    import signal
    import threading
    work_dir = tmp_path / 'preempt'
    cfg = _tiny_cfg(pseudo_dataset, work_dir)
    cfg['train_cfg']['max_iters'] = 50
    cfg['default_hooks']['checkpoint']['interval'] = 1000  # never on its own
    runner = Runner(cfg, seed=0)
    # deliver SIGTERM shortly after training starts
    t = threading.Timer(8.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    t.start()
    state = runner.train()
    t.cancel()
    step = int(state.step)
    assert step < 50, 'training should have been preempted'
    from lednet_tpu.engine.checkpoint import find_latest_checkpoint
    latest = find_latest_checkpoint(str(work_dir))
    assert latest is not None and f'iter_{step}' in latest


def test_custom_keys_lr_mult_and_decay_mult():
    """paramwise_cfg.custom_keys: lr_mult scales updates for matching keys;
    decay_mult=0 opts them out of weight decay (reference
    DefaultOptimWrapperConstructor semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from lednet_tpu.engine.optim import build_optimizer, paramwise_decay_mask

    tx, _ = build_optimizer(
        dict(optimizer=dict(type='SGD', lr=1.0),
             paramwise_cfg=dict(custom_keys={
                 'head': dict(lr_mult=10.0),
                 'pos_block': dict(decay_mult=0.0)})),
        [dict(type='ConstantLR', factor=1.0, begin=0, end=10)])
    params = {'backbone': {'conv': {'kernel': jnp.ones((2,))}},
              'head': {'conv': {'kernel': jnp.ones((2,))}}}
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    ratio = float(updates['head']['conv']['kernel'][0] /
                  updates['backbone']['conv']['kernel'][0])
    assert np.isclose(ratio, 10.0)

    mask_fn = paramwise_decay_mask(dict(custom_keys={
        'pos_block': dict(decay_mult=0.0)}))
    tree = {'pos_block': {'proj': {'kernel': jnp.ones(1)}},
            'other': {'kernel': jnp.ones(1)}}
    m = mask_fn(tree)
    assert m['pos_block']['proj']['kernel'] is False
    assert m['other']['kernel'] is True


def test_custom_keys_fractional_decay_and_longest_match():
    """mmseg parity: the longest matching custom key wins entirely (its
    decay_mult defaulting to 1, overriding norm_decay_mult), fractional
    decay_mult scales decay instead of being coerced to 0/1, and dotted
    mmseg-style keys match '/'-joined paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.engine.optim import scaled_weight_decay

    # longest match 'head' has no decay_mult -> default 1 even though
    # norm_decay_mult=0 would otherwise zero it
    tx = scaled_weight_decay(0.1, dict(
        norm_decay_mult=0.0,
        custom_keys={'head': dict(lr_mult=10.0),
                     'pos_block': dict(decay_mult=0.5),
                     'decode_head.conv_seg': dict(decay_mult=0.0)}))
    params = {'head': {'norm': {'scale': jnp.ones(1)}},
              'backbone': {'norm': {'scale': jnp.ones(1)}},
              'pos_block': {'proj': {'kernel': jnp.ones(1)}},
              'decode_head': {'conv_seg': {'kernel': jnp.ones(1)}},
              'plain': {'kernel': jnp.ones(1)}}
    zeros = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, tx.init(params), params)
    assert np.isclose(float(updates['head']['norm']['scale'][0]), 0.1)
    assert np.isclose(float(updates['backbone']['norm']['scale'][0]), 0.0)
    assert np.isclose(float(updates['pos_block']['proj']['kernel'][0]), 0.05)
    assert np.isclose(
        float(updates['decode_head']['conv_seg']['kernel'][0]), 0.0)
    assert np.isclose(float(updates['plain']['kernel'][0]), 0.1)


def test_force_default_constructor_decay_rules():
    """ForceDefaultOptimWrapperConstructor parity (reference
    mmseg/engine/optimizers/force_default_constructor.py:202-233): the
    default elif chain is norm -> bias -> dwconv -> flat, each rule active
    only when its mult is set; a depthwise conv is a 4-D kernel with one
    input channel per group; force_default_settings makes the defaults
    override a matching custom key."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.engine.optim import scaled_weight_decay

    params = {
        'bn': {'scale': jnp.ones(4), 'bias': jnp.ones(4)},
        'dw_conv': {'kernel': jnp.ones((3, 3, 1, 8)),
                    'bias': jnp.ones(8)},
        'conv': {'kernel': jnp.ones((3, 3, 4, 8)), 'bias': jnp.ones(8)},
        'prelu': {'negative_slope': jnp.ones(8)},
    }
    zeros = jax.tree.map(jnp.zeros_like, params)

    def decays(cfg, wd=1.0):
        tx = scaled_weight_decay(wd, cfg)
        updates, _ = tx.update(zeros, tx.init(params), params)
        return jax.tree.map(lambda u: float(u.reshape(-1)[0]), updates)

    d = decays(dict(norm_decay_mult=0.0, bias_decay_mult=0.5,
                    dwconv_decay_mult=0.25, flat_decay_mult=0.125))
    assert d['bn']['scale'] == 0.0 and d['bn']['bias'] == 0.0
    # dwconv bias: the bias rule fires first (reference elif order)
    assert d['dw_conv']['bias'] == 0.5
    assert d['dw_conv']['kernel'] == 0.25
    assert d['conv']['kernel'] == 1.0 and d['conv']['bias'] == 0.5
    # flat: 1-D, not a bias, not under a norm scope
    assert d['prelu']['negative_slope'] == 0.125

    # None-ness is part of each condition: with norm_decay_mult unset, a
    # norm bias falls through to the bias rule; the dwconv bias falls
    # through to the dwconv rule when bias_decay_mult is unset
    d = decays(dict(bias_decay_mult=0.5))
    assert d['bn']['bias'] == 0.5 and d['bn']['scale'] == 1.0
    d = decays(dict(dwconv_decay_mult=0.25))
    assert d['dw_conv']['bias'] == 0.25 and d['dw_conv']['kernel'] == 0.25

    # force_default_settings: the custom key matches but defaults override
    d = decays(dict(custom_keys={'dw_conv': dict(decay_mult=0.9)},
                    dwconv_decay_mult=0.25, force_default_settings=True))
    assert d['dw_conv']['kernel'] == 0.25
    d = decays(dict(custom_keys={'dw_conv': dict(decay_mult=0.9)},
                    dwconv_decay_mult=0.25))
    assert np.isclose(d['dw_conv']['kernel'], 0.9)


def test_bias_lr_mult_and_force_default_lr():
    """bias_lr_mult scales updates for non-norm biases; a matching custom
    key suppresses it unless force_default_settings is set."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lednet_tpu.engine.optim import build_optimizer

    params = {'conv': {'kernel': jnp.ones((3, 3, 4, 8)),
                       'bias': jnp.ones(8)},
              'bn': {'scale': jnp.ones(4), 'bias': jnp.ones(4)},
              'head': {'conv': {'bias': jnp.ones(8)}}}
    grads = jax.tree.map(jnp.ones_like, params)

    def ups(paramwise_cfg):
        tx, _ = build_optimizer(
            dict(optimizer=dict(type='SGD', lr=1.0),
                 paramwise_cfg=paramwise_cfg),
            [dict(type='ConstantLR', factor=1.0, begin=0, end=10)])
        updates, _ = tx.update(grads, tx.init(params), params)
        return jax.tree.map(lambda u: float(u.reshape(-1)[0]), updates)

    u = ups(dict(bias_lr_mult=2.0))
    assert np.isclose(u['conv']['bias'], -2.0)
    assert np.isclose(u['conv']['kernel'], -1.0)
    assert np.isclose(u['bn']['bias'], -1.0)  # norm bias excluded

    # custom key wins over bias_lr_mult ...
    u = ups(dict(bias_lr_mult=2.0, custom_keys={'head': dict(lr_mult=10.0)}))
    assert np.isclose(u['head']['conv']['bias'], -10.0)
    # ... unless force_default_settings overrides it
    u = ups(dict(bias_lr_mult=2.0, force_default_settings=True,
                 custom_keys={'head': dict(lr_mult=10.0)}))
    assert np.isclose(u['head']['conv']['bias'], -2.0)
    assert np.isclose(u['conv']['bias'], -2.0)
