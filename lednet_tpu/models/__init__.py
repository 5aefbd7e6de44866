from lednet_tpu.models import layers  # noqa: F401
from lednet_tpu.models.aff import AFF, IAFF, MutiAFF  # noqa: F401
from lednet_tpu.models.data_preprocessor import SegDataPreProcessor  # noqa: F401
from lednet_tpu.models.espnet import CESPB, SESP, ESPDownSampler  # noqa: F401
from lednet_tpu.models.getb import GETBBlock, GlobalLocalAttention  # noqa: F401
from lednet_tpu.models.necks import (FPN, JPU, Feature2Pyramid,  # noqa: F401
                                     ICNeck, MLANeck, MultiLevelNeck)
from lednet_tpu.models.ppm import DAPPM, PAPPM  # noqa: F401
from lednet_tpu.models.seam import SEAM  # noqa: F401

from lednet_tpu.models.backbones import *  # noqa: F401,F403
from lednet_tpu.models.decode_heads import *  # noqa: F401,F403
from lednet_tpu.models.losses import *  # noqa: F401,F403
from lednet_tpu.models.segmentors import *  # noqa: F401,F403
from lednet_tpu.models.text_encoder import CLIPTextEncoder  # noqa: F401
