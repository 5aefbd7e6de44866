from lednet_tpu.evaluation.iou_metric import IoUMetric, intersect_and_union
from lednet_tpu.evaluation.more_metrics import CityscapesMetric, DepthMetric

__all__ = ['IoUMetric', 'intersect_and_union', 'CityscapesMetric',
           'DepthMetric']
