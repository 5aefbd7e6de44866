# DDRNet-23 (reference ddrnet_23_in1k-pre_2xb6-120k: channels 64, OCNet
# class weights, in1k-pretrained init)

_base_ = './ddrnet_23-slim_cityscapes-1024x1024.py'

# per-class CE weights borrowed upstream from OCNet (see the reference file)
class_weight = [
    0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489, 0.8786,
    1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955, 1.0865, 1.1529,
    1.0507
]
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/ddrnet/pretrain/ddrnet23-in1kpre_3rdparty-9ca29f62.pth'  # noqa
model = dict(
    backbone=dict(
        channels=64,
        init_cfg=dict(type='Pretrained', checkpoint=checkpoint)),
    decode_head=dict(
        in_channels=64 * 4,
        channels=128,
        loss_decode=[
            dict(type='OhemCrossEntropy', thres=0.9, min_kept=131072,
                 class_weight=class_weight, loss_weight=1.0),
            dict(type='OhemCrossEntropy', thres=0.9, min_kept=131072,
                 class_weight=class_weight, loss_weight=0.4),
        ]))
