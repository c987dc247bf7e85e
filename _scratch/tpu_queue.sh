#!/bin/bash
# Probe-gated TPU runner (CLAUDE.md rule 9): loop a small-matmul probe with
# a hard timeout until the chip answers, then exec the queued command.
# Usage: bash _scratch/tpu_queue.sh <cmd...>
cd "$(dirname "$0")/.."
while true; do
    if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('probe ok', float((x @ x).sum()))
" >/dev/null 2>&1; then
        echo "[tpu_queue] probe ok at $(date -u +%H:%M:%S), running: $*"
        break
    fi
    echo "[tpu_queue] TPU unreachable at $(date -u +%H:%M:%S); retry in 120s"
    sleep 120
done
exec "$@"
