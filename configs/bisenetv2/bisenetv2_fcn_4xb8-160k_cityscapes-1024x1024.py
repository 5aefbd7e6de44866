# BiSeNetV2, doubled batch (reference bisenetv2_fcn_4xb8-160k_...)

_base_ = './bisenetv2_cityscapes-1024x1024.py'
train_dataloader = dict(batch_size=8, num_workers=4)
val_dataloader = dict(batch_size=1, num_workers=4)
test_dataloader = val_dataloader
