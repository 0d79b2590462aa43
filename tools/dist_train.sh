#!/usr/bin/env bash
# Multi-host single-task training launcher (reference tools/dist_train.sh).
# Same contract as dist_train_increment.sh — run on every host.
set -euo pipefail

CONFIG=$1
shift || true
export OMP_NUM_THREADS=${OMP_NUM_THREADS:-1}
export MKL_NUM_THREADS=${MKL_NUM_THREADS:-1}

exec python "$(dirname "$0")/train.py" "$CONFIG" --launcher dist "$@"
