#!/bin/bash
# Round-5 completion queue (post-reboot: /tmp logs + warm caches were lost,
# so the r5c/r5d/r5e chain never ran). Re-runs the three owed stages:
#   1. bench.py driver mode  -> dense-capacity number of record (warm median)
#   2. dense_decomp full_r3 / full_r3_dk / topk_ex  -> decode-kernel +
#      exact-topk marginals on the two-stage dense default
#   3. tools/tpu_kernel_smoke.py  -> round-ledger PASS/FAIL line
# Gates: waits for /tmp/cpu_busy to disappear (pytest contention made a
# cold compile take ~32 min in r5b), then probes the chip before each stage.
cd "$(dirname "$0")/.."

while [ -e /tmp/cpu_busy ]; do
    echo "[r5f] host CPU busy at $(date -u +%H:%M:%S); wait 60s"
    sleep 60
done

probe() {
    while true; do
        if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))
" >/dev/null 2>&1; then
            echo "[r5f] probe ok at $(date -u +%H:%M:%S)"
            return
        fi
        echo "[r5f] TPU unreachable at $(date -u +%H:%M:%S); retry in 120s"
        sleep 120
    done
}

echo "=== r5f stage 1: bench.py driver mode (both capacities) ==="
probe
timeout 3600 python bench.py

echo "=== r5f stage 2: dense A/B remainder (full_r3, full_r3_dk, topk_ex) ==="
probe
timeout 3600 python _scratch/dense_decomp.py full_r3 full_r3_dk topk_ex

echo "=== r5f stage 3: compiled-kernel smoke ==="
probe
timeout 1800 python tools/tpu_kernel_smoke.py

echo "=== r5f done at $(date -u +%H:%M:%S) ==="
