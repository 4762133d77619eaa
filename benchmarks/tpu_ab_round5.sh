#!/bin/bash
# Round-5 TPU A/B campaign — the full round-4 queue (VERDICT r4 item 1)
# re-run at round-5 HEAD, with --repeats medians on the record lines
# (VERDICT item 5). Run from the repo root on a healthy axon chip with
# NO concurrent CPU-heavy jobs (CLAUDE.md host-starvation rule).
#
#   bash benchmarks/tpu_ab_round5.sh [--quick]
#
# --quick: headline A/Bs only (skip dielectric/rods2d).
set -u
cd "$(dirname "$0")/.."
source benchmarks/ab_lib.sh
ab_init results/ab_r5

QUICK=${1:-}

# 0. Headline control (the recorded 6.09/6.97 configuration), median of
#    3 steady passes — the round-5 variance-honest record line.
run warm_control 1200 --repeats 3

# 1. warm-chain pc-mode A/Bs (STATUS §0a: the ~45-85 ms/k setup issued
#    once per launch; parity-gated in tests).
run chain8_batched 900 --mode warm-chain --chain 8 --pc-mode batched --nk 32
run chain8_bsetup  900 --mode warm-chain --chain 8 --pc-mode batched-setup --nk 32
run chain4_bsetup  900 --mode warm-chain --chain 4 --pc-mode batched-setup --nk 32
run chain8_perk    900 --mode warm-chain --chain 8 --pc-mode per-k   --nk 32
run chain16_bsetup 900 --mode warm-chain --chain 16 --pc-mode batched-setup --nk 32

# 2. pc_rep factor vs inv; headline block size (see round-4 script notes).
run warm_pcfactor  900 --pc-rep factor
run warm_block14   900 --block 14
run warm_block12   900 --block 12

# 3. Fused-sweep Pallas Jacobi (STATUS §6 gap 2: the ~12.6 ms/iter floor).
echo "=== pallas_jacobi: BRAVAIS_JACOBI_PALLAS=1 python bench.py" >&2
if BRAVAIS_JACOBI_PALLAS=1 timeout 900 python bench.py \
     > "$OUT/warm_pallas_jacobi.json" 2> "$OUT/warm_pallas_jacobi.log"; then
  echo "warm_pallas_jacobi: $(tail -1 "$OUT/warm_pallas_jacobi.json")"
else
  echo "FAILED/TIMEOUT: warm_pallas_jacobi (see $OUT/warm_pallas_jacobi.log)" >&2
  echo '{"failed": "warm_pallas_jacobi"}' > "$OUT/warm_pallas_jacobi.FAILED.json"
fi

if [ "$QUICK" = "--quick" ]; then exit 0; fi

# 4. Dielectric config 3 (VERDICT item 2: adjudicate the 1.65e-3
#    residual — per-k residual/iteration breakdown is now in every
#    bench detail line; diel_warm_tight is the device-tol 1e-5 control).
run diel_warm     2400 --problem dielectric --repeats 3
run diel_warm_tight 1800 --problem dielectric --device-tol 1e-5
run diel_block14  1800 --problem dielectric --block 14
run diel_block13  1800 --problem dielectric --block 13
run diel_batched  1800 --problem dielectric --mode batched
run diel_batched8 1800 --problem dielectric --mode batched --chunk 8
run diel_batched_rt 1800 --problem dielectric --mode batched --restart-tol 3e-3
run diel_chain4   1800 --problem dielectric --mode warm-chain --chain 4

# 5. Config-2 rods2d (first TPU record for the 2D dielectric axis).
run rods2d_warm   1800 --problem rods2d --repeats 3

echo "=== done; results in $OUT" >&2
