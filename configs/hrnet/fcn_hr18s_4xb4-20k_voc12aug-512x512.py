# HRNetV2-W18-Small variant of fcn_hr18_4xb4-20k_voc12aug-512x512

_base_ = './fcn_hr18_4xb4-20k_voc12aug-512x512.py'
model = dict(
    backbone=dict(
        extra=dict(
            stage1=dict(num_blocks=(2,)),
            stage2=dict(num_blocks=(2, 2)),
            stage3=dict(num_modules=3, num_blocks=(2, 2, 2)),
            stage4=dict(num_modules=2, num_blocks=(2, 2, 2, 2)))))
