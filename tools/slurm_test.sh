#!/usr/bin/env bash
# Slurm evaluation launcher (parity: reference tools/slurm_test.sh).
#
# Usage: tools/slurm_test.sh PARTITION JOB_NAME CONFIG [NODES] [extra...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
NODES=${4:-1}
shift $(( $# > 3 ? 4 : 3 ))

srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks="$NODES" --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python "$(dirname "$0")/test.py" "$CONFIG" "$@"
