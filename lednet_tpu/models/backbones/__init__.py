from lednet_tpu.models.backbones.ddrnet import DDRNet
from lednet_tpu.models.backbones.lednet import LEDNet

__all__ = ['DDRNet', 'LEDNet']
