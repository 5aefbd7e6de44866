# Tiny smoke config for the /verify drive — NOT a benchmark config.
_base_ = ['./lednet_80k_branch-512x1024.py']
crop_size = (64, 64)
data_preprocessor = dict(size=crop_size)
model = dict(
    backbone=dict(channels=16, ppm_channels=32),
    decode_head=dict(
        in_channels=16 * 4,
        channels=16,
        loss_decode=[
            dict(type='OhemCrossEntropy', thres=0.9, min_kept=512,
                 loss_weight=1.0),
            dict(type='OhemCrossEntropy', thres=0.9, min_kept=512,
                 loss_weight=0.4),
        ]),
    data_preprocessor=data_preprocessor)
train_dataloader = dict(
    batch_size=4,
    dataset=dict(
        data_root='/tmp/verify_data',
        data_prefix=dict(img_path='JPEGImages',
                         seg_map_path='SegmentationClassPNG'),
        ann_file='ImageSets/Segmentation/train.txt',
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations'),
            dict(type='RandomCrop', crop_size=crop_size),
            dict(type='RandomFlip', prob=0.5),
            dict(type='PackSegInputs'),
        ]))
val_dataloader = dict(
    batch_size=1,
    dataset=dict(
        data_root='/tmp/verify_data',
        data_prefix=dict(img_path='JPEGImages',
                         seg_map_path='SegmentationClassPNG'),
        ann_file='ImageSets/Segmentation/val.txt',
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations'),
            dict(type='PackSegInputs'),
        ]))
test_dataloader = val_dataloader
train_cfg = dict(type='IterBasedTrainLoop', max_iters=100, val_interval=100)
default_hooks = dict(
    logger=dict(type='LoggerHook', interval=20),
    checkpoint=dict(type='CheckpointHook', by_epoch=False, interval=100))
