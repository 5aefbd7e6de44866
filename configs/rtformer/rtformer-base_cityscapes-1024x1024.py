# RTFormer-Base on Cityscapes 1024x1024. The reference repo ships only a
# broken 13-line rtformer.py stub; this config drives our from-paper
# implementation (lednet_tpu/models/backbones/rtformer.py): GPU-friendly
# external attention (low branch) + cross-resolution attention (high branch).
_base_ = [
    '../_base_/datasets/cityscapes_1024x1024.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]
crop_size = (1024, 1024)
data_preprocessor = dict(
    type='SegDataPreProcessor',
    size=crop_size,
    mean=[123.675, 116.28, 103.53],
    std=[58.395, 57.12, 57.375],
    bgr_to_rgb=True,
    pad_val=0,
    seg_pad_val=255)
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    data_preprocessor=data_preprocessor,
    backbone=dict(
        type='RTFormer',
        in_channels=3,
        base_channels=64,
        high_channels=128,
        num_heads=8,
        num_tokens=144,
        cross_size=12,
        ppm_channels=128,
        norm_cfg=norm_cfg,
        align_corners=False),
    decode_head=dict(
        type='FCNHead',
        in_channels=256,
        in_index=1,
        channels=128,
        num_convs=1,
        concat_input=False,
        dropout_ratio=0.,
        num_classes=19,
        align_corners=False,
        norm_cfg=norm_cfg,
        loss_decode=dict(type='OhemCrossEntropy', thres=0.9,
                         min_kept=65536, loss_weight=1.0)),
    auxiliary_head=dict(
        type='FCNHead',
        in_channels=128,
        in_index=0,
        channels=64,
        num_convs=1,
        concat_input=False,
        dropout_ratio=0.,
        num_classes=19,
        align_corners=False,
        norm_cfg=norm_cfg,
        loss_decode=dict(type='OhemCrossEntropy', thres=0.9,
                         min_kept=65536, loss_weight=0.4)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))

iters = 120000
train_cfg = dict(max_iters=iters, val_interval=1000)
param_scheduler = [
    dict(type='PolyLR', eta_min=0, power=0.9, begin=0, end=iters,
         by_epoch=False)
]
train_dataloader = dict(batch_size=6, num_workers=4)
