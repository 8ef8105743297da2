#!/usr/bin/env bash
# Multi-host TPU training launcher — the analogue of the reference's
# torch.distributed.launch wrapper (tools/dist_train.sh). On TPU pods every
# host runs the same program; jax.distributed.initialize() discovers peers
# from the TPU runtime, so this simply execs train.py with --launcher tpu.
#   ./tools/dist_train.sh CONFIG [extra args...]
CONFIG=$1
shift
exec python "$(dirname "$0")/train.py" "$CONFIG" --launcher tpu "$@"
