# STDC2 (reference stdc2_4xb12-80k: STDCNet2 stage depths)

_base_ = './stdc1_cityscapes-512x1024.py'
model = dict(backbone=dict(backbone_cfg=dict(stdc_type='STDCNet2')))
