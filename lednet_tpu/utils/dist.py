"""Multi-process (multi-host) initialization.

Reference analogue: the ``--launcher {pytorch,slurm,mpi}`` flag consumed by
mmengine's ``init_dist`` (reference ``tools/train.py:44-48``,
``tools/dist_train.sh``, ``tools/slurm_train.sh``). There the launcher
spawns one process per GPU and wires NCCL; on TPU one process drives every
local chip, so the launcher's only job is joining the hosts into one JAX
coordination service — afterwards ``jax.devices()`` is the global mesh and
SPMD sharding replaces DDP.

Launcher mapping:

- ``pytorch``: reads the ``torch.distributed.launch`` environment
  (``MASTER_ADDR``/``MASTER_PORT``/``WORLD_SIZE``/``RANK``) so the
  reference's launch scripts keep working with one process per *host*.
- ``slurm`` / ``mpi``: defers to ``jax.distributed.initialize()`` whose
  cluster auto-detection understands Slurm (``SLURM_*``) and Open MPI
  (``OMPI_*``) environments natively.
- ``none``: no-op (single host).
"""
from __future__ import annotations

import os


def _already_initialized() -> bool:
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:
        return False


def init_distributed(launcher: str = 'none') -> None:
    """Join the global JAX coordination service per the launcher contract."""
    if launcher in (None, 'none'):
        return
    import jax

    if _already_initialized():
        return
    if launcher == 'pytorch':
        world = int(os.environ.get('WORLD_SIZE', '1'))
        if world <= 1:
            return
        addr = os.environ.get('MASTER_ADDR', '127.0.0.1')
        port = os.environ.get('MASTER_PORT', '29500')
        rank = int(os.environ.get('RANK', '0'))
        jax.distributed.initialize(
            coordinator_address=f'{addr}:{port}',
            num_processes=world, process_id=rank)
    else:  # slurm / mpi — jax's built-in cluster detection
        # Single-process Slurm allocations (the common "srun on one node"
        # case) do not need a coordinator; skip to keep them dependency-free.
        if launcher == 'slurm' and int(os.environ.get('SLURM_NTASKS', '1')) <= 1:
            return
        jax.distributed.initialize()
