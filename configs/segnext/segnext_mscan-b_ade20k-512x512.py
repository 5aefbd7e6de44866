# SegNeXt MSCAN-B (reference segnext_mscan-b_1xb16-adamw-160k
# overrides on the tiny config)

_base_ = './segnext_mscan-t_ade20k-512x512.py'
model = dict(
    backbone=dict(
        embed_dims=(64, 128, 320, 512),
        depths=(3, 3, 12, 3),
        drop_path_rate=0.1),
    decode_head=dict(
        in_channels=(128, 320, 512),
        channels=512,
        ham_channels=512))
