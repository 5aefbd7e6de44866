# PIDNet-M (reference pidnet-m_2xb6-120k: wider channels)

_base_ = './pidnet-s_cityscapes-1024x1024.py'
model = dict(
    backbone=dict(channels=64),
    decode_head=dict(in_channels=256))
