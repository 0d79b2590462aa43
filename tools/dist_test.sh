#!/usr/bin/env bash
# Multi-host evaluation launcher (parity: reference tools/dist_test.sh).
# Same contract as dist_train.sh: run this on EVERY host of the pod; the
# TPU runtime wires jax.distributed peer discovery and per-host result
# shards gather through parallel/collect.py inside tools/test.py.
#
# Usage (per host): tools/dist_test.sh CONFIG [--task T --epoch E ...]
set -euo pipefail

CONFIG=$1
shift || true
export OMP_NUM_THREADS=${OMP_NUM_THREADS:-1}
export MKL_NUM_THREADS=${MKL_NUM_THREADS:-1}

exec python "$(dirname "$0")/test.py" "$CONFIG" "$@"
