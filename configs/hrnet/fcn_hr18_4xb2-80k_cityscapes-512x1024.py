# FCN + HRNetV2-W18 on cityscapes (reference configs/hrnet/fcn_hr18_4xb2-80k_cityscapes-512x1024.py semantics)

_base_ = [
    '../_base_/models/fcn_hr18.py',
    '../_base_/datasets/cityscapes.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]

crop_size = (512, 1024)
data_preprocessor = dict(size=crop_size)

model = dict(
    data_preprocessor=data_preprocessor)
