# BiSeNetV2 with OHEM pixel sampling on every head (reference
# bisenetv2_fcn_4xb4-ohem-160k; NOTE the fork file assigns to ``models`` —
# a typo that silently no-ops upstream; implemented for real here)

_base_ = './bisenetv2_cityscapes-1024x1024.py'
norm_cfg = dict(type='SyncBN', requires_grad=True)
sampler = dict(type='OHEMPixelSampler', thresh=0.7, min_kept=10000)
model = dict(
    decode_head=dict(sampler=sampler),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=16, channels=16, num_convs=2,
             num_classes=19, in_index=1, norm_cfg=norm_cfg,
             concat_input=False, align_corners=False, sampler=sampler,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0)),
        dict(type='FCNHead', in_channels=32, channels=64, num_convs=2,
             num_classes=19, in_index=2, norm_cfg=norm_cfg,
             concat_input=False, align_corners=False, sampler=sampler,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0)),
        dict(type='FCNHead', in_channels=64, channels=256, num_convs=2,
             num_classes=19, in_index=3, norm_cfg=norm_cfg,
             concat_input=False, align_corners=False, sampler=sampler,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0)),
        dict(type='FCNHead', in_channels=128, channels=1024, num_convs=2,
             num_classes=19, in_index=4, norm_cfg=norm_cfg,
             concat_input=False, align_corners=False, sampler=sampler,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0)),
    ])
