#!/bin/bash
# Runs after r5d: the per-round compiled-kernel smoke (PASS/FAIL line for
# the round ledger, tools/tpu_kernel_smoke.py's own standing instruction).
cd "$(dirname "$0")/.."

until grep -q "r5d done" /tmp/r5d.log 2>/dev/null; do
    sleep 60
done

probe() {
    while true; do
        if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))
" >/dev/null 2>&1; then
            echo "[r5e] probe ok at $(date -u +%H:%M:%S)"
            return
        fi
        echo "[r5e] TPU unreachable at $(date -u +%H:%M:%S); retry in 120s"
        sleep 120
    done
}

echo "=== r5e: compiled-kernel smoke ==="
probe
timeout 1800 python tools/tpu_kernel_smoke.py

echo "=== r5e done at $(date -u +%H:%M:%S) ==="
