#!/usr/bin/env bash
# Slurm launcher (reference-CLI-compatible: tools/slurm_train.sh).
#
# TPU adaptation: the reference spawns one task per GPU; on TPU one python
# process drives every chip a host owns, so we launch ONE task per node and
# let `--launcher slurm` join the hosts via jax.distributed (whose cluster
# detection reads the SLURM_* environment directly — no MASTER_ADDR plumbing).
#
# Usage (same positional shape as the reference; GPUS_PER_NODE env is
# accepted for compat and ignored — everything after CONFIG passes through
# to train.py, e.g. --work-dir DIR --amp):
#   ./tools/slurm_train.sh PARTITION JOB_NAME CONFIG [train.py args]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
shift 3

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$NODES" \
    --ntasks="$NODES" \
    --ntasks-per-node=1 \
    --cpus-per-task="$CPUS_PER_TASK" \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    python -u "$(dirname $0)/train.py" "$CONFIG" --launcher slurm "$@"
