#!/usr/bin/env bash
# Multi-host TPU eval launcher (reference tools/dist_test.sh analogue).
#   ./tools/dist_test.sh CONFIG CHECKPOINT [extra args...]
CONFIG=$1
CKPT=$2
shift 2
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" --launcher tpu "$@"
