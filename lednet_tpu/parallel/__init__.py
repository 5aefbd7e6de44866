from lednet_tpu.parallel.mesh import (batch_sharding, image_sharding,
                                      make_mesh, make_mesh_2d, replicated,
                                      shard_batch)
from lednet_tpu.parallel.sharded_inference import sharded_predict

__all__ = ['batch_sharding', 'image_sharding', 'make_mesh', 'make_mesh_2d',
           'replicated', 'shard_batch', 'sharded_predict']
