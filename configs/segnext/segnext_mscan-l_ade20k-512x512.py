# SegNeXt MSCAN-L (reference segnext_mscan-l_1xb16-adamw-160k
# overrides on the tiny config)

_base_ = './segnext_mscan-t_ade20k-512x512.py'
model = dict(
    backbone=dict(
        embed_dims=(64, 128, 320, 512),
        depths=(3, 5, 27, 3),
        drop_path_rate=0.3),
    decode_head=dict(
        in_channels=(128, 320, 512),
        channels=1024,
        ham_channels=1024))
