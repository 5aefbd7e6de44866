from lednet_tpu.models.segmentors.encoder_decoder import (EncoderDecoder,
                                                          postprocess_logits)

__all__ = ['EncoderDecoder', 'postprocess_logits']
