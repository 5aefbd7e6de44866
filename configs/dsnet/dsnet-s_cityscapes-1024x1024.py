# DSNet-S (standalone model; the reference's dsnet.py is broken in-repo —
# ours is the working reconstruction, see docs/parity_matrix.md)
_base_ = [
    '../_base_/datasets/cityscapes_1024x1024.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]
crop_size = (1024, 1024)
data_preprocessor = dict(
    type='SegDataPreProcessor', size=crop_size,
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    bgr_to_rgb=True, pad_val=0, seg_pad_val=255)
model = dict(
    type='DSNet', m=2, n=2, num_classes=19, planes=32,
    name_variant='s128', augment=True)
