# FCN + HRNetV2-W18 on pascal_voc12_aug (reference configs/hrnet/fcn_hr18_4xb4-20k_voc12aug-512x512.py semantics)

_base_ = [
    '../_base_/models/fcn_hr18.py',
    '../_base_/datasets/pascal_voc12_aug.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_20k.py',
]

crop_size = (512, 512)
data_preprocessor = dict(size=crop_size)

model = dict(
    data_preprocessor=data_preprocessor,
    decode_head=dict(num_classes=21))
