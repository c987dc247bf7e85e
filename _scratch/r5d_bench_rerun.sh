#!/bin/bash
# Runs after r5c_followup.sh: clean driver-mode bench.py at both
# capacities (programs are warm in /tmp/jax_tpu_cache after the r5b
# stage-5 compile), so the dense capacity gets a full >=4-trial median.
cd "$(dirname "$0")/.."

until grep -q "r5c done" /tmp/r5c_followup.log 2>/dev/null; do
    sleep 60
done

probe() {
    while true; do
        if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))
" >/dev/null 2>&1; then
            echo "[r5d] probe ok at $(date -u +%H:%M:%S)"
            return
        fi
        echo "[r5d] TPU unreachable at $(date -u +%H:%M:%S); retry in 120s"
        sleep 120
    done
}

echo "=== r5d: driver-mode bench.py (both capacities, warm cache) ==="
probe
timeout 2400 python bench.py

echo "=== r5d done at $(date -u +%H:%M:%S) ==="
