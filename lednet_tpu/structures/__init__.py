from lednet_tpu.structures.sampler import OHEMPixelSampler
from lednet_tpu.structures.seg_data_sample import PixelData, SegDataSample

__all__ = ['PixelData', 'SegDataSample', 'OHEMPixelSampler']
