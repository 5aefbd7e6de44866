from lednet_tpu.models.backbones.ddrnet import DDRNet
from lednet_tpu.models.backbones.lednet import LEDNet
from lednet_tpu.models.backbones.pidnet import PIDNet

__all__ = ['DDRNet', 'LEDNet', 'PIDNet']
