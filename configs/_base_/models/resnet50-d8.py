# Shared skeleton: dilated ResNet-50-D8 encoder (output stride 8) with the
# standard ImageNet preprocessing. The per-model skeletons in this directory
# inherit this and add their decode/auxiliary heads, mirroring the reference
# configs/_base_/models/*_r50-d8.py corpus (which inlines this block in every
# file).
norm_cfg = dict(type='SyncBN', requires_grad=True)
data_preprocessor = dict(
    type='SegDataPreProcessor',
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    bgr_to_rgb=True, pad_val=0, seg_pad_val=255)
model = dict(
    type='EncoderDecoder',
    data_preprocessor=data_preprocessor,
    backbone=dict(
        type='ResNetV1c', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        dilations=(1, 1, 2, 4), strides=(1, 2, 1, 1), norm_cfg=norm_cfg,
        norm_eval=False, style='pytorch', contract_dilation=True),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
