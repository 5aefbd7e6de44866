from lednet_tpu.models.backbones.bisenetv1 import BiSeNetV1
from lednet_tpu.models.backbones.bisenetv2 import BiSeNetV2
from lednet_tpu.models.backbones.ddrnet import DDRNet
from lednet_tpu.models.backbones.lednet import LEDNet
from lednet_tpu.models.backbones.mit import MixVisionTransformer
from lednet_tpu.models.backbones.mscan import MSCAN
from lednet_tpu.models.backbones.pidnet import PIDNet
from lednet_tpu.models.backbones.resnet import ResNet, ResNetV1c, ResNetV1d
from lednet_tpu.models.backbones.stdc import (STDCContextPathNet, STDCModule,
                                              STDCNet)

__all__ = ['BiSeNetV1', 'BiSeNetV2', 'DDRNet', 'LEDNet', 'PIDNet', 'ResNet',
           'ResNetV1c', 'ResNetV1d', 'STDCContextPathNet', 'STDCModule',
           'STDCNet']
