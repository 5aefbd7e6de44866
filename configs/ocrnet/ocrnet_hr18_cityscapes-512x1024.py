# OCRNet (cascade FCN -> OCR head) over HRNet-W18 (reference configs/ocrnet)
_base_ = ['../hrnet/fcn_hr18_cityscapes-512x1024.py']
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(
    type='CascadeEncoderDecoder',
    num_stages=2,
    decode_head=[
        dict(type='FCNHead', in_channels=[18, 36, 72, 144],
             in_index=(0, 1, 2, 3), input_transform='resize_concat',
             channels=270, kernel_size=1, num_convs=1, concat_input=False,
             dropout_ratio=-1, num_classes=19, norm_cfg=norm_cfg,
             align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=0.4)),
        dict(type='OCRHead', in_channels=[18, 36, 72, 144],
             in_index=(0, 1, 2, 3), input_transform='resize_concat',
             channels=512, ocr_channels=256, dropout_ratio=-1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0)),
    ])
