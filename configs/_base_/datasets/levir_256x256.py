# LEVIR-CD building change detection (reference
# _base_/datasets/levir_256x256.py: paired A/B imagery concatenated to a
# 6-channel input; Albumentations jitter when the package is present).
dataset_type = 'LEVIRCDDataset'
data_root = 'data/LEVIRCD'
albu_train_transforms = [
    dict(type='RandomBrightnessContrast', p=0.2),
    dict(type='HorizontalFlip', p=0.5),
    dict(type='VerticalFlip', p=0.5)
]
train_pipeline = [
    dict(type='LoadMultipleRSImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Albu',
         keymap={'img': 'image', 'img2': 'image2', 'gt_seg_map': 'mask'},
         transforms=albu_train_transforms,
         additional_targets={'image2': 'image'},
         bgr_to_rgb=False),
    dict(type='ConcatCDInput'),
    dict(type='PackSegInputs')
]
test_pipeline = [
    dict(type='LoadMultipleRSImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='ConcatCDInput'),
    dict(type='PackSegInputs')
]
tta_pipeline = [
    dict(type='LoadMultipleRSImageFromFile'),
    dict(type='TestTimeAug',
         transforms=[[dict(type='LoadAnnotations')],
                     [dict(type='ConcatCDInput')],
                     [dict(type='PackSegInputs')]])
]
train_dataloader = dict(
    batch_size=4, num_workers=4, persistent_workers=True,
    sampler=dict(type='InfiniteSampler', shuffle=True),
    dataset=dict(type=dataset_type, data_root=data_root,
                 data_prefix=dict(img_path='train/A', img_path2='train/B',
                                  seg_map_path='train/label'),
                 pipeline=train_pipeline))
val_dataloader = dict(
    batch_size=1, num_workers=4, persistent_workers=True,
    sampler=dict(type='DefaultSampler', shuffle=False),
    dataset=dict(type=dataset_type, data_root=data_root,
                 data_prefix=dict(img_path='test/A', img_path2='test/B',
                                  seg_map_path='test/label'),
                 pipeline=test_pipeline))
test_dataloader = val_dataloader
val_evaluator = dict(type='IoUMetric', iou_metrics=['mIoU'])
test_evaluator = val_evaluator
