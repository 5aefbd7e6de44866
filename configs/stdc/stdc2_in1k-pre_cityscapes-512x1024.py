# STDC2 with an ImageNet-pretrained backbone (reference stdc2_in1k-pre_...)

_base_ = './stdc2_cityscapes-512x1024.py'
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/stdc/stdc2_20220308-7dbd9127.pth'  # noqa
model = dict(
    backbone=dict(backbone_cfg=dict(
        init_cfg=dict(type='Pretrained', checkpoint=checkpoint))))
