#!/bin/bash
# Runs after r5b_tpu_runs.sh completes: the stage-1 variants its 2400s
# timeout cut off (cold-cache compiles + pytest host contention made the
# first program take ~32 min; cache is warm now).
cd "$(dirname "$0")/.."

until grep -q "r5b TPU queue done" /tmp/r5b_queue.log 2>/dev/null; do
    sleep 60
done

probe() {
    while true; do
        if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))
" >/dev/null 2>&1; then
            echo "[r5c] probe ok at $(date -u +%H:%M:%S)"
            return
        fi
        echo "[r5c] TPU unreachable at $(date -u +%H:%M:%S); retry in 120s"
        sleep 120
    done
}

echo "=== r5c: dense A/B remainder (full_r3 vs full_r3_dk, topk_ex) ==="
probe
timeout 3600 python _scratch/dense_decomp.py full_r3 full_r3_dk topk_ex

echo "=== r5c done at $(date -u +%H:%M:%S) ==="
