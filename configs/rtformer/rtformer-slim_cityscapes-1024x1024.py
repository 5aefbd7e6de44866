# RTFormer-Slim: half-width variant of rtformer-base.
_base_ = ['./rtformer-base_cityscapes-1024x1024.py']
model = dict(
    backbone=dict(base_channels=32, high_channels=64),
    decode_head=dict(in_channels=128, channels=64),
    auxiliary_head=dict(in_channels=64, channels=32))
