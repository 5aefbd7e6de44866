# SCTNet-B (reference mmseg/models/backbones/sctnet.py default widths)
_base_ = [
    '../_base_/datasets/cityscapes_1024x1024.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]
crop_size = (1024, 1024)
data_preprocessor = dict(
    type='SegDataPreProcessor', size=crop_size,
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    bgr_to_rgb=True, pad_val=0, seg_pad_val=255)
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    data_preprocessor=data_preprocessor,
    backbone=dict(type='SCTNet', base_channels=64, spp_channels=128,
                  num_heads=8),
    decode_head=dict(
        type='SCTHead', in_channels=256, in_index=0, channels=128,
        dropout_ratio=0.1, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='OhemCrossEntropy', thres=0.9,
                         min_kept=131072, loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
