#!/bin/bash
# Round-5 remaining TPU queue (relaunch after the 2026-08-19 session drop).
# Probe uses a 300s timeout: first TPU contact after tunnel idle took ~118s.
cd "$(dirname "$0")/.."

probe() {
    while true; do
        if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))
" >/dev/null 2>&1; then
            echo "[r5b] probe ok at $(date -u +%H:%M:%S)"
            return
        fi
        echo "[r5b] TPU unreachable at $(date -u +%H:%M:%S); retry in 120s"
        sleep 120
    done
}

echo "=== r5b stage 1: product-default A/B (two-stage, decode kernel on/off) K=512 ==="
probe
timeout 2400 python _scratch/dense_decomp.py full_r3 full_r3_dk topk_str topk_ex

echo "=== r5b stage 2: train pieces ladder at bs=64 ==="
probe
timeout 2400 python _scratch/batch_scaling.py pieces 64

echo "=== r5b stage 3: train pieces ladder at bs=8 ==="
probe
timeout 2400 python _scratch/batch_scaling.py pieces 8

echo "=== r5b stage 4: device tile pipeline bench ==="
probe
timeout 3600 python _scratch/tile_bench.py 1024,1024 2048,2048 3072,3072

echo "=== r5b stage 5: product bench, new protocol, both capacities ==="
probe
timeout 2400 python bench.py

echo "=== r5b TPU queue done at $(date -u +%H:%M:%S) ==="
