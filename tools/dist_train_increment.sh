#!/usr/bin/env bash
# Multi-host incremental training launcher (the reference's
# tools/dist_train_increment.sh, torch.distributed.launch -> jax.distributed).
#
# On Cloud TPU pods, run the SAME command on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all`); jax.distributed
# autodetects coordinator/process ids from the TPU metadata:
#   tools/dist_train_increment.sh CONFIG [extra args...]
#
# For manual CPU/GPU-style launches set the rendezvous explicitly:
#   DSKD_COORDINATOR=host0:1234 DSKD_NUM_PROCESSES=4 DSKD_PROCESS_ID=$i \
#       tools/dist_train_increment.sh CONFIG
set -euo pipefail

CONFIG=$1
shift || true

# single-threaded host BLAS: the hot path is on-device, host threads only
# fight the input pipeline (mirrors the reference's OMP/MKL caps)
export OMP_NUM_THREADS=${OMP_NUM_THREADS:-1}
export MKL_NUM_THREADS=${MKL_NUM_THREADS:-1}

exec python "$(dirname "$0")/train_increment.py" "$CONFIG" \
    --launcher dist "$@"
