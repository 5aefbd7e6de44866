# BiSeNetV1 R-18, bs=8 (reference bisenetv1_r18-d32-in1k-pre_4xb8-...py:
# thin child of the 4xb4 in1k-pre config with a doubled batch)

_base_ = './bisenetv1_r18-d32-in1k-pre_4xb4-160k_cityscapes-1024x1024.py'
train_dataloader = dict(batch_size=8, num_workers=4)
val_dataloader = dict(batch_size=1, num_workers=4)
test_dataloader = val_dataloader
