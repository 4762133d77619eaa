#!/bin/bash
# Prioritized subset of tpu_ab_round4.sh for a short TPU window:
# headline control, dielectric re-record (round-4d trims), then the
# warm-chain pc-mode A/Bs. Same result layout (results/ab_r4/).
set -u
cd "$(dirname "$0")/.."
source benchmarks/ab_lib.sh   # ADVICE r4: shared run(), per-commit outdir
ab_init results/ab_r4
run warm_control 1200
run diel_warm 2400 --problem dielectric
run chain8_batched 1200 --mode warm-chain --chain 8 --pc-mode batched --nk 32
run chain8_bsetup 1200 --mode warm-chain --chain 8 --pc-mode batched-setup --nk 32
run warm_block12 900 --block 12
run warm_pcfactor 900 --pc-rep factor
echo "=== priority set done" >&2
