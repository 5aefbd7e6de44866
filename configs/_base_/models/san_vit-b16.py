# SAN (Side Adapter Network) over frozen CLIP ViT-B/16 — reference
# configs/_base_/models/san_vit-b16.py semantics, on this framework's
# flattened SideAdapterCLIPHead ctor surface. COCO-Stuff 171-class
# open-vocabulary default; per-dataset configs supply the vocabulary.
norm_cfg = dict(type='SyncBN', requires_grad=True)
data_preprocessor = dict(
    type='SegDataPreProcessor',
    mean=[122.7709, 116.7460, 104.0937], std=[68.5005, 66.6322, 70.3232],
    bgr_to_rgb=True, pad_val=0, seg_pad_val=255, size_divisor=640,
    test_cfg=dict(size_divisor=32))
num_classes = 171
model = dict(
    type='MultimodalEncoderDecoder',
    data_preprocessor=data_preprocessor,
    pretrained='pretrain/clip_vit_base_patch16_224.pth',
    asymetric_input=True,
    encoder_resolution=0.5,
    image_encoder=dict(
        type='VisionTransformer', img_size=(224, 224), patch_size=16,
        in_channels=3, embed_dims=768, num_layers=9, num_heads=12,
        mlp_ratio=4, out_indices=(2, 5, 8), qkv_bias=True, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, with_cls_token=True,
        output_cls_token=True, pre_norm=True,
        norm_cfg=dict(type='LN', eps=1e-5), norm_eval=False,
        interpolate_mode='bicubic', frozen_exclude=['pos_embed']),
    text_encoder=dict(
        type='CLIPTextEncoder', dataset_name=None, templates='vild',
        embed_dims=512, num_layers=12, num_heads=8, mlp_ratio=4,
        output_dims=512, cache_feature=True, cat_bg=True,
        norm_cfg=dict(type='LN', eps=1e-5)),
    decode_head=dict(
        type='SideAdapterCLIPHead', num_classes=num_classes,
        deep_supervision_idxs=(7,), clip_channels=768, embed_dims=240,
        patch_size=16, num_queries=100, num_encode_layer=8, num_san_heads=6,
        fusion_index=(0, 1, 2, 3), rec_num_layers=3, rec_num_heads=12,
        out_dims=512, align_corners=False,
        # reference san_vit-b16.py:101-104: point-sampled mask losses
        train_cfg=dict(num_points=12544, oversample_ratio=3.0,
                       importance_sample_ratio=0.75)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
