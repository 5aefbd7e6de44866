#!/usr/bin/env bash
# Slurm eval launcher (reference-CLI-compatible: tools/slurm_test.sh);
# see slurm_train.sh for the one-task-per-node TPU rationale.
#
# Usage:
#   ./tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [extra args]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
shift 4

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$NODES" \
    --ntasks="$NODES" \
    --ntasks-per-node=1 \
    --cpus-per-task="$CPUS_PER_TASK" \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    python -u "$(dirname $0)/test.py" "$CONFIG" "$CHECKPOINT" \
    --launcher slurm "$@"
