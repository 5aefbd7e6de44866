# default runtime (analogue of the reference's _base_/default_runtime.py,
# minus torch/NCCL env knobs — parallelism is the jax device mesh)
default_scope = 'lednet_tpu'
log_level = 'INFO'
load_from = None
resume = False
vis_backends = [dict(type='LocalVisBackend'),
                dict(type='TensorboardVisBackend')]
visualizer = dict(type='SegLocalVisualizer', vis_backends=vis_backends,
                  name='visualizer')
log_processor = dict(by_epoch=False)
tta_model = dict(type='SegTTAModel')
