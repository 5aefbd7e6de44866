# Mask2Former over ResNet-50 (reference configs via mmdet; masked-attention
# decoder without the deformable pixel decoder — see docs/parity_matrix.md)
_base_ = ['../pspnet/pspnet_r50-d8_cityscapes-512x1024.py']
model = dict(
    type='EncoderDecoder',
    backbone=dict(strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1)),
    decode_head=dict(
        _delete_=True,
        type='Mask2FormerHead', in_channels=[256, 512, 1024, 2048],
        in_index=[0, 1, 2, 3], channels=256, feat_channels=256,
        num_queries=100, num_transformer_decoder_layers=6, num_heads=8,
        num_classes=19, align_corners=False),
    auxiliary_head=None)
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.05)
optim_wrapper = dict(type='OptimWrapper', optimizer=optimizer,
                     clip_grad=dict(max_norm=0.01))
