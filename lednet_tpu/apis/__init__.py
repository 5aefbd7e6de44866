from lednet_tpu.apis.inference import (inference_model, init_model,
                                       show_result_pyplot)
from lednet_tpu.apis.mmseg_inferencer import MMSegInferencer
from lednet_tpu.apis.remote_sense_inferencer import RSInferencer

__all__ = ['init_model', 'inference_model', 'show_result_pyplot',
           'MMSegInferencer', 'RSInferencer']
