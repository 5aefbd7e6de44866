from lednet_tpu.models.segmentors.cascade_encoder_decoder import \
    CascadeEncoderDecoder
from lednet_tpu.models.segmentors.depth_estimator import DepthEstimator
from lednet_tpu.models.segmentors.encoder_decoder import (EncoderDecoder,
                                                          postprocess_logits)
from lednet_tpu.models.segmentors.multimodal import MultimodalEncoderDecoder
from lednet_tpu.models.segmentors.seg_tta import SegTTAModel, merge_tta_probs

__all__ = ['DepthEstimator', 'EncoderDecoder', 'postprocess_logits', 'SegTTAModel',
           'merge_tta_probs', 'MultimodalEncoderDecoder']
