# SAN over CLIP ViT-B/16 (reference configs/san/san-vit-b16_*; open
# vocabulary from the cityscapes class names). Pre-trained CLIP weights can
# be transplanted with tools/model_converters/mmseg2jax.py; set
# CLIP_BPE_PATH to the merges file for real CLIP token ids.
_base_ = ['../_base_/datasets/cityscapes_1024x1024.py',
          '../_base_/default_runtime.py',
          '../_base_/schedules/schedule_80k.py']
crop_size = (512, 512)
cityscapes_classes = [
    'road', 'sidewalk', 'building', 'wall', 'fence', 'pole', 'traffic light',
    'traffic sign', 'vegetation', 'terrain', 'sky', 'person', 'rider', 'car',
    'truck', 'bus', 'train', 'motorcycle', 'bicycle']
data_preprocessor = dict(
    type='SegDataPreProcessor', size=crop_size,
    mean=[122.7709, 116.7460, 104.0937],
    std=[68.5005, 66.6322, 70.3232], bgr_to_rgb=True, pad_val=0,
    seg_pad_val=255)
model = dict(
    type='MultimodalEncoderDecoder',
    data_preprocessor=data_preprocessor,
    asymetric_input=True,
    encoder_resolution=0.5,
    image_encoder=dict(
        type='VisionTransformer', img_size=(256, 256), patch_size=16,
        embed_dims=768, num_layers=9, num_heads=12,
        out_indices=(2, 5, 8), output_cls_token=True, final_norm=True),
    text_encoder=dict(
        type='CLIPTextEncoder', vocabulary=cityscapes_classes,
        templates='vild', embed_dims=512, num_layers=12, num_heads=8,
        output_dims=512, cat_bg=True),
    decode_head=dict(
        type='SideAdapterCLIPHead', num_classes=19, clip_channels=768,
        embed_dims=240, num_queries=100, patch_size=16, num_encode_layer=8,
        num_san_heads=6, fusion_index=(0, 1, 2, 3), rec_num_layers=3,
        rec_num_heads=12, out_dims=512, deep_supervision_idxs=(7,)),
    test_cfg=dict(mode='whole'))
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=1e-4)
optim_wrapper = dict(type='OptimWrapper', optimizer=optimizer,
                     clip_grad=dict(max_norm=0.01))
