#!/bin/bash
# Probe the axon TPU worker until it answers, then launch the round-5
# A/B campaign (benchmarks/tpu_ab_round5.sh). Round-4 lesson: the
# worker can be down for hours — this keeps the first healthy window
# from being wasted. Probe is a tiny jitted matmul with a hard timeout.
set -u
cd "$(dirname "$0")/.."
LOG=results/tpu_watchdog.log
mkdir -p results
echo "watchdog start $(date -u +%H:%M:%SZ)" >> "$LOG"
while true; do
  if timeout 240 python - >> "$LOG" 2>&1 <<'EOF'
import time, jax, jax.numpy as jnp
t = time.time()
f = jax.jit(lambda x: (x @ x).sum())
v = float(f(jnp.ones((256, 256), jnp.float32)))
print(f"probe ok: {v:.3e} in {time.time()-t:.1f}s", flush=True)
EOF
  then
    echo "TPU UP at $(date -u +%H:%M:%SZ) — launching campaign" >> "$LOG"
    touch /tmp/tpu_up
    bash benchmarks/tpu_ab_round5.sh >> "$LOG" 2>&1
    echo "campaign finished at $(date -u +%H:%M:%SZ)" >> "$LOG"
    touch /tmp/tpu_campaign_done
    exit 0
  fi
  echo "probe failed $(date -u +%H:%M:%SZ); retry in 120s" >> "$LOG"
  sleep 120
done
