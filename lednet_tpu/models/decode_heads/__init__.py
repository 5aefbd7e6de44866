from lednet_tpu.models.decode_heads.context_heads import (ANNHead, APCHead,
                                                          CCHead, DAHead,
                                                          DMHead, DNLHead,
                                                          EMAHead, EncHead,
                                                          GCHead, ISAHead,
                                                          SETRUPHead)
from lednet_tpu.models.decode_heads.fcn_head import FCNHead
from lednet_tpu.models.decode_heads.ham_head import LightHamHead
from lednet_tpu.models.decode_heads.led_head import DDRHead, LEDHead
from lednet_tpu.models.decode_heads.knet_head import (IterativeDecodeHead,
                                                      KernelUpdateHead,
                                                      KernelUpdator)
from lednet_tpu.models.decode_heads.maskformer_head import (Mask2FormerHead,
                                                            MaskFormerHead)
from lednet_tpu.models.decode_heads.pid_head import PIDHead
from lednet_tpu.models.decode_heads.san_head import SideAdapterCLIPHead
from lednet_tpu.models.decode_heads.point_setr_heads import (DPTHead,
                                                             PointHead,
                                                             PSAHead,
                                                             SegmenterMaskTransformerHead,
                                                             SETRMLAHead)
from lednet_tpu.models.decode_heads.psp_aspp import (ASPPHead,
                                                     DepthwiseSeparableASPPHead,
                                                     PSPHead, SegformerHead)
from lednet_tpu.models.decode_heads.stdc_head import STDCHead
from lednet_tpu.models.decode_heads.uper_ocr import (DepthwiseSeparableFCNHead,
                                                     LRASPPHead, NLHead,
                                                     OCRHead, UPerHead)
from lednet_tpu.models.decode_heads.fpn_sct_heads import FPNHead, SCTHead
from lednet_tpu.models.decode_heads.vpd_depth_head import (VPDDepthDecoder,
                                                           VPDDepthHead)

__all__ = ['FCNHead', 'DDRHead', 'LEDHead', 'PIDHead', 'STDCHead', 'PSPHead',
           'ASPPHead', 'DepthwiseSeparableASPPHead', 'SegformerHead',
           'LightHamHead', 'UPerHead', 'OCRHead',
           'DepthwiseSeparableFCNHead', 'LRASPPHead', 'NLHead', 'ANNHead', 'APCHead',
           'DMHead', 'DNLHead', 'EMAHead', 'EncHead', 'GCHead', 'ISAHead',
           'SETRUPHead', 'CCHead', 'DAHead', 'PointHead', 'PSAHead', 'SETRMLAHead',
           'DPTHead', 'SegmenterMaskTransformerHead', 'MaskFormerHead',
           'Mask2FormerHead', 'IterativeDecodeHead', 'KernelUpdateHead',
           'KernelUpdator', 'SideAdapterCLIPHead', 'VPDDepthDecoder',
           'VPDDepthHead', 'FPNHead', 'SCTHead']
