from lednet_tpu.models.backbones.bisenetv1 import BiSeNetV1
from lednet_tpu.models.backbones.bisenetv2 import BiSeNetV2
from lednet_tpu.models.backbones.cgnet import CGNet
from lednet_tpu.models.backbones.convnext import ConvNeXt, PoolFormer
from lednet_tpu.models.backbones.ddrnet import DDRNet
from lednet_tpu.models.backbones.dsnet import DSNet, MFACB, SPASPP
from lednet_tpu.models.backbones.erfnet import ERFNet
from lednet_tpu.models.backbones.fast_scnn import FastSCNN
from lednet_tpu.models.backbones.hrnet import HRNet
from lednet_tpu.models.backbones.icnet import ICNet
from lednet_tpu.models.backbones.lednet import LEDNet
from lednet_tpu.models.backbones.mit import MixVisionTransformer
from lednet_tpu.models.backbones.mobilenet import MobileNetV2, MobileNetV3
from lednet_tpu.models.backbones.mscan import MSCAN
from lednet_tpu.models.backbones.pidnet import PIDNet
from lednet_tpu.models.backbones.resnet import ResNet, ResNetV1c, ResNetV1d
from lednet_tpu.models.backbones.resnext import (BEiT, MAE, ResNeSt, ResNeXt,
                                                 TIMMBackbone, VPD)
from lednet_tpu.models.backbones.rtformer import RTFormer
from lednet_tpu.models.backbones.sctnet import SCTNet
from lednet_tpu.models.backbones.stdc import (STDCContextPathNet, STDCModule,
                                              STDCNet)
from lednet_tpu.models.backbones.twins import PCPVT, SVT
from lednet_tpu.models.backbones.u2net import U2Net
from lednet_tpu.models.backbones.unet import UNet
from lednet_tpu.models.backbones.vit import SwinTransformer, VisionTransformer

__all__ = ['BiSeNetV1', 'BiSeNetV2', 'CGNet', 'ConvNeXt', 'PoolFormer',
           'DDRNet', 'DSNet', 'ERFNet', 'FastSCNN', 'SCTNet',
           'HRNet', 'ICNet', 'LEDNet', 'MixVisionTransformer', 'MobileNetV2',
           'MobileNetV3', 'MSCAN', 'PIDNet', 'ResNet', 'ResNetV1c',
           'ResNetV1d', 'ResNeXt', 'ResNeSt', 'BEiT', 'MAE', 'STDCContextPathNet', 'STDCModule', 'STDCNet', 'U2Net', 'UNet', 'PCPVT', 'SVT',
           'RTFormer', 'SwinTransformer', 'VisionTransformer']
