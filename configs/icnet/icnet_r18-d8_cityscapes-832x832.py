# ICNet over ResNet-18 (reference configs/icnet semantics)
_base_ = [
    '../_base_/datasets/cityscapes_1024x1024.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]
crop_size = (832, 832)
data_preprocessor = dict(
    type='SegDataPreProcessor', size=crop_size,
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    bgr_to_rgb=True, pad_val=0, seg_pad_val=255)
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    data_preprocessor=data_preprocessor,
    backbone=dict(
        type='ICNet',
        backbone_cfg=dict(type='ResNet', depth=18),
        in_channels=3, layer_channels=(128, 512),
        light_branch_middle_channels=32, psp_out_channels=512,
        out_channels=(64, 128, 512), norm_cfg=norm_cfg),
    neck=dict(type='ICNeck', in_channels=(64, 128, 512), out_channels=128,
              norm_cfg=norm_cfg, align_corners=False),
    decode_head=dict(
        type='FCNHead', in_channels=128, channels=128, num_convs=1,
        in_index=2, concat_input=False, dropout_ratio=0, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=128, channels=128, num_convs=1,
             in_index=0, concat_input=False, dropout_ratio=0, num_classes=19,
             norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=0.4)),
        dict(type='FCNHead', in_channels=128, channels=128, num_convs=1,
             in_index=1, concat_input=False, dropout_ratio=0, num_classes=19,
             norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=0.4)),
    ],
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
