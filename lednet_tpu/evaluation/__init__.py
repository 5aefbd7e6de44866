from lednet_tpu.evaluation.iou_metric import IoUMetric, intersect_and_union

__all__ = ['IoUMetric', 'intersect_and_union']
