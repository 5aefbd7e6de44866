from lednet_tpu.apis.inference import (inference_model, init_model,
                                       show_result_pyplot)
from lednet_tpu.apis.mmseg_inferencer import MMSegInferencer

__all__ = ['init_model', 'inference_model', 'show_result_pyplot',
           'MMSegInferencer']
