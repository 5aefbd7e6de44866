# FastFCN: ResNet-50-D32 + Joint Pyramid Upsampling neck + PSP head —
# reference configs/_base_/models/fastfcn_r50-d32_jpu_psp.py semantics.
_base_ = './resnet50-d8.py'
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(
    backbone=dict(dilations=(1, 1, 2, 4), strides=(1, 2, 2, 2),
                  out_indices=(1, 2, 3)),
    neck=dict(type='JPU', in_channels=(512, 1024, 2048), mid_channels=512,
              start_level=0, end_level=-1, dilations=(1, 2, 4, 8),
              align_corners=False, norm_cfg=norm_cfg),
    decode_head=dict(
        type='PSPHead', in_channels=2048, in_index=2, channels=512,
        pool_scales=(1, 2, 3, 6), dropout_ratio=0.1, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=dict(
        type='FCNHead', in_channels=1024, in_index=1, channels=256,
        num_convs=1, concat_input=False, dropout_ratio=0.1, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=0.4)))
