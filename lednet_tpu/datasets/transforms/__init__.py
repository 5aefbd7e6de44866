from lednet_tpu.datasets.transforms.formatting import PackSegInputs
from lednet_tpu.datasets.transforms.tta import TestTimeAug
from lednet_tpu.datasets.transforms.loading import (LoadAnnotations,
                                                    LoadDepthAnnotation,
                                                    LoadImageFromFile,
                                                    LoadImageFromNDArray,
                                                    LoadMultipleRSImageFromFile)
from lednet_tpu.datasets.transforms.transforms import (CLAHE, AdjustGamma,
                                                       ConcatCDInput,
                                                       GenerateEdge, Pad,
                                                       PhotoMetricDistortion,
                                                       RandomCrop,
                                                       RandomDepthMix,
                                                       RandomFlip,
                                                       RandomResize,
                                                       RandomRotate,
                                                       RandomRotFlip, Rerange,
                                                       Resize,
                                                       ResizeToMultiple,
                                                       RGB2Gray, SegRescale,
                                                       Albu, RandomMosaic,
                                                       ResizeShortestEdge)
from lednet_tpu.datasets.transforms.fused import FusedRandomResizeCropFlip
from lednet_tpu.datasets.transforms.biomedical import (
    BioMedical3DPad, BioMedical3DRandomCrop, BioMedical3DRandomFlip,
    BioMedicalGaussianBlur, BioMedicalGaussianNoise, BioMedicalRandomGamma,
    LoadBiomedicalAnnotation, LoadBiomedicalImageFromFile)
