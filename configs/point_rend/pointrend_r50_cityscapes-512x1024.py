# PointRend over ResNet-50 + FPN-style coarse head (reference
# configs/point_rend semantics, compacted: FCN coarse + PointHead refine)
_base_ = ['../pspnet/pspnet_r50-d8_cityscapes-512x1024.py']
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(
    type='CascadeEncoderDecoder',
    num_stages=2,
    backbone=dict(strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1)),
    decode_head=[
        dict(type='FCNHead', in_channels=2048, in_index=3, channels=256,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0)),
        dict(type='PointHead', in_channels=256, in_index=0, channels=256,
             num_points=2048, num_classes=19, align_corners=False),
    ],
    auxiliary_head=None)
