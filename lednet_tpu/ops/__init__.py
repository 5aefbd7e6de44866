from lednet_tpu.ops.pool import (adaptive_avg_pool2d, avg_pool2d,
                                 global_avg_pool, max_pool2d)
from lednet_tpu.ops.resize import resize, resize_bilinear, resize_nearest
from lednet_tpu.ops.carafe import CARAFE, carafe_reassemble
