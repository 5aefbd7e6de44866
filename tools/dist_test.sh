#!/usr/bin/env bash
# Reference-CLI-compatible eval launcher (reference tools/dist_test.sh);
# see dist_train.sh for the SPMD rationale.
CONFIG=$1
CHECKPOINT=$2
GPUS=$3
shift 3 || shift 2 || shift 1
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
python "$(dirname $0)/test.py" "$CONFIG" "$CHECKPOINT" "$@"
