#!/usr/bin/env bash
# SLURM launcher (reference tools/slurm_train.sh analogue): one task per
# TPU host; jax.distributed.initialize() picks coordinator from SLURM env.
#   GPUS_PER_NODE is meaningless on TPU pods; tasks-per-node is 1.
#   PARTITION=... JOB_NAME=... ./tools/slurm_train.sh CONFIG [args...]
set -x
PARTITION=${PARTITION:-tpu}
JOB_NAME=${JOB_NAME:-ciaosr}
NODES=${NODES:-1}
CONFIG=$1
shift
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python "$(dirname "$0")/train.py" "$CONFIG" --launcher tpu "$@"
