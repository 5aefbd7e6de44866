# BiSeNetV1 (reference configs/bisenetv1/bisenetv1_r18-d32-in1k-pre_4xb4-160k_cityscapes-1024x1024.py semantics; the fork repoints these at pascal_voc12+80k — kept upstream here)

_base_ = [
    '../_base_/models/bisenetv1_r18-d32.py',
    '../_base_/datasets/cityscapes_1024x1024.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_160k.py',
]

crop_size = (1024, 1024)
data_preprocessor = dict(size=crop_size)
norm_cfg = dict(type='SyncBN', requires_grad=True)

model = dict(
    data_preprocessor=data_preprocessor,
    backbone=dict(backbone_cfg=dict(
        init_cfg=dict(type='Pretrained',
                      checkpoint='open-mmlab://resnet18_v1c'))))

param_scheduler = [
    dict(type='LinearLR', by_epoch=False, start_factor=0.1, begin=0,
         end=1000),
    dict(type='PolyLR', eta_min=1e-4, power=0.9, begin=1000, end=160000,
         by_epoch=False),
]
optimizer = dict(type='SGD', lr=0.025, momentum=0.9, weight_decay=0.0005)
optim_wrapper = dict(type='OptimWrapper', optimizer=optimizer)
train_dataloader = dict(batch_size=4, num_workers=4)
val_dataloader = dict(batch_size=1, num_workers=4)
test_dataloader = val_dataloader
