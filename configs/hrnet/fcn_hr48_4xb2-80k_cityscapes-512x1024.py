# HRNetV2-W48 variant of fcn_hr18_4xb2-80k_cityscapes-512x1024

_base_ = './fcn_hr18_4xb2-80k_cityscapes-512x1024.py'
model = dict(
    backbone=dict(
        extra=dict(
            stage2=dict(num_channels=(48, 96)),
            stage3=dict(num_channels=(48, 96, 192)),
            stage4=dict(num_channels=(48, 96, 192, 384)))),
    decode_head=dict(in_channels=[48, 96, 192, 384],
                     channels=sum([48, 96, 192, 384])))
