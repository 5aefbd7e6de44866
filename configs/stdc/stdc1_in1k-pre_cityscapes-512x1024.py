# STDC1 with an ImageNet-pretrained backbone (reference stdc1_in1k-pre_...)

_base_ = './stdc1_cityscapes-512x1024.py'
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/stdc/stdc1_20220308-5368626c.pth'  # noqa
model = dict(
    backbone=dict(backbone_cfg=dict(
        init_cfg=dict(type='Pretrained', checkpoint=checkpoint))))
