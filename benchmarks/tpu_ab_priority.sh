#!/bin/bash
# Prioritized subset of tpu_ab_round4.sh for a short TPU window:
# headline control, dielectric re-record (round-4d trims), then the
# warm-chain pc-mode A/Bs. Same result layout (results/ab_r4/).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/ab_r4
run() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "=== $name: python bench.py $* (timeout ${tmo}s)" >&2
  if timeout "$tmo" python bench.py "$@" > "results/ab_r4/$name.json" 2> "results/ab_r4/$name.log"; then
    echo "$name: $(tail -1 "results/ab_r4/$name.json")"
  else
    echo "FAILED/TIMEOUT: $name (see results/ab_r4/$name.log)" >&2
  fi
}
run warm_control 1200
run diel_warm 2400 --problem dielectric
run chain8_batched 1200 --mode warm-chain --chain 8 --pc-mode batched --nk 32
run chain8_bsetup 1200 --mode warm-chain --chain 8 --pc-mode batched-setup --nk 32
run warm_block12 900 --block 12
run warm_pcfactor 900 --pc-rep factor
echo "=== priority set done" >&2
