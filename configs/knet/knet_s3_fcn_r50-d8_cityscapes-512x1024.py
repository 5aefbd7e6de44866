# K-Net s3 over ResNet-50-D8 with an FCN kernel-generate head
# (reference: configs/knet/knet-s3_r50-d8_fcn_*; semantic K-Net uses
# conv_kernel_size=1, 3 update stages, per-stage CE supervision)
_base_ = ['../pspnet/pspnet_r50-d8_cityscapes-512x1024.py']
model = dict(
    type='EncoderDecoder',
    decode_head=dict(
        _delete_=True,
        type='IterativeDecodeHead',
        in_channels=2048, in_index=3, channels=256, num_classes=19,
        num_stages=3, num_convs=2, num_heads=8,
        feedforward_channels=1024, num_mask_fcs=1, hard_mask_thr=0.5,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=None)
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.0005)
optim_wrapper = dict(type='OptimWrapper', optimizer=optimizer,
                     clip_grad=dict(max_norm=1.0))
