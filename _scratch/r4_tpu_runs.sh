#!/bin/bash
# Round-4 TPU measurement queue: probe-gated sequence (CLAUDE.md rule 9).
# Each stage re-probes so a mid-sequence tunnel outage only delays the
# remaining stages instead of hanging them.
cd "$(dirname "$0")/.."

probe() {
    while true; do
        if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))
" >/dev/null 2>&1; then
            echo "[r4] probe ok at $(date -u +%H:%M:%S)"
            return
        fi
        echo "[r4] TPU unreachable at $(date -u +%H:%M:%S); retry in 120s"
        sleep 120
    done
}

echo "=== stage 1: dense-capacity NMS A/B (K=512) ==="
probe
timeout 2400 python _scratch/dense_decomp.py full_r3 full full_g2 full_bf16

echo "=== stage 2: compiled-mode kernel smoke ==="
probe
timeout 2400 python tools/tpu_kernel_smoke.py

echo "=== stage 3: train-step batch scaling ==="
probe
timeout 3600 python _scratch/batch_scaling.py 8 16 32 64

echo "=== r4 TPU queue done at $(date -u +%H:%M:%S) ==="
