# BiSeNetV2 with mixed precision (reference bisenetv2_fcn_4xb4-amp-160k:
# AmpOptimWrapper + loss_scale 512; on TPU this maps to bf16 compute, which
# needs no loss scaling)

_base_ = './bisenetv2_cityscapes-1024x1024.py'
bf16 = True
