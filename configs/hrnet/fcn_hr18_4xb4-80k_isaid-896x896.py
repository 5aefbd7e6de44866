# FCN + HRNetV2-W18 on isaid (reference configs/hrnet/fcn_hr18_4xb4-80k_isaid-896x896.py semantics)

_base_ = [
    '../_base_/models/fcn_hr18.py',
    '../_base_/datasets/isaid.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_80k.py',
]

crop_size = (896, 896)
data_preprocessor = dict(size=crop_size)

model = dict(
    data_preprocessor=data_preprocessor,
    decode_head=dict(num_classes=16))
