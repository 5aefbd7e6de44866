# PIDNet-L (reference pidnet-l_2xb6-120k: wider + deeper)

_base_ = './pidnet-s_cityscapes-1024x1024.py'
model = dict(
    backbone=dict(channels=64, ppm_channels=112, num_stem_blocks=3,
                  num_branch_blocks=4),
    decode_head=dict(in_channels=256, channels=256))
