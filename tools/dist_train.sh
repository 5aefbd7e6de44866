#!/usr/bin/env bash
# Reference-CLI-compatible launcher (reference tools/dist_train.sh).
#
# On TPU there are no per-device worker processes: one python process drives
# every local chip through the SPMD mesh, so this script simply forwards to
# tools/train.py. GPUS is accepted and ignored (the mesh uses all local
# devices). Multi-HOST runs set the jax.distributed env
# (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) and run
# this script once per host.
CONFIG=$1
GPUS=$2
shift 2 || shift 1
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
python "$(dirname $0)/train.py" "$CONFIG" "$@"
