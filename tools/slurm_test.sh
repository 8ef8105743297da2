#!/usr/bin/env bash
# SLURM eval launcher (reference tools/slurm_test.sh analogue).
set -x
PARTITION=${PARTITION:-tpu}
JOB_NAME=${JOB_NAME:-ciaosr-test}
NODES=${NODES:-1}
CONFIG=$1
CKPT=$2
shift 2
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" --launcher tpu "$@"
