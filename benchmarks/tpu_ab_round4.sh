#!/bin/bash
# Round-4 queued TPU A/B measurements (docs/STATUS.md §0/§0a: "TPU A/B
# queued behind the outage"). Run from the repo root on a healthy axon
# chip, with NO concurrent CPU-heavy jobs (CLAUDE.md host-starvation
# rule). Each run is bounded; results land in results/ab_r4/*.json.
#
#   bash benchmarks/tpu_ab_round4.sh [--quick]
#
# --quick: headline A/Bs only (skip dielectric/rods2d, which pay a
# ~2 min cold-compile each when .jax_cache is cold).
# SUPERSEDED by tpu_ab_round5.sh (same queue at round-5 HEAD, with
# --repeats medians); kept runnable for reproducing the round-4 lines.
set -u
cd "$(dirname "$0")/.."
source benchmarks/ab_lib.sh   # ADVICE r4: shared run(), per-commit outdir
ab_init results/ab_r4

QUICK=${1:-}

# 0. Headline control (the recorded 6.09/s configuration).
run warm_control 900

# 1. warm-chain batched-pc vs per-k vs warm (§0a: the ~45 ms/k pc build
#    issued once per launch; parity-gated in tests).
run chain8_batched 900 --mode warm-chain --chain 8 --pc-mode batched --nk 32
run chain8_bsetup  900 --mode warm-chain --chain 8 --pc-mode batched-setup --nk 32
run chain4_bsetup  900 --mode warm-chain --chain 4 --pc-mode batched-setup --nk 32
run chain8_perk    900 --mode warm-chain --chain 8 --pc-mode per-k   --nk 32
run chain16_bsetup 900 --mode warm-chain --chain 16 --pc-mode batched-setup --nk 32

# 2. pc_rep factor vs inv (§0: skips the ~29 GFLOP YcᴴYc per k for one
#    extra skinny GEMM per iteration).
run warm_pcfactor  900 --pc-rep factor

# 2b. Headline block size (CPU n=4 p=2 proxy, 2026-08-19: m 16->14->12
#    gives iters 5.9->6.1->7.4 at IDENTICAL accuracy and 2.3x CPU
#    throughput — but the TPU iteration is latency-bound (~12.6 ms
#    nearly independent of m), so more iters may LOSE on-chip; measure).
run warm_block14   900 --block 14
run warm_block12   900 --block 12

# 3. Fused-sweep Pallas Jacobi (opt-in; d5523c3): the measured
#    ~12.6 ms/iter dispatch floor candidate fix.
echo "=== pallas_jacobi: BRAVAIS_JACOBI_PALLAS=1 python bench.py" >&2
if BRAVAIS_JACOBI_PALLAS=1 timeout 900 python bench.py \
     > "$OUT/warm_pallas_jacobi.json" 2> "$OUT/warm_pallas_jacobi.log"; then
  tail -1 "$OUT/warm_pallas_jacobi.json"
else
  echo "FAILED/TIMEOUT: warm_pallas_jacobi" >&2
fi

if [ "$QUICK" = "--quick" ]; then exit 0; fi

# 4. Dielectric config 3: warm (re-record — now defaults to the
#    field device_tol 1e-4, measured accuracy-neutral on CPU) vs
#    batched (CPU-verified parity 5.6e-8; vmap-over-k amortizes the
#    per-op dispatch latency that dominates this small-dof
#    field-engine path). diel_warm_tight isolates the device-tol
#    gain (the round-4 recorded 0.363 was at the old 1e-5 stop).
run diel_warm     1800 --problem dielectric
run diel_warm_tight 1800 --problem dielectric --device-tol 1e-5
# Block size: m=nev+3..4 measured iteration-neutral vs nev+4 on the
# CPU proxy (benchmarks exp: m 9->8 flat, 7 slightly worse at nev=5);
# smaller m cuts per-iteration applies AND the 3m-row RR eigh rounds
# ~19%. Judge by eig/s + iters + residual (no analytic oracle here).
run diel_block14  1800 --problem dielectric --block 14
run diel_block13  1800 --problem dielectric --block 13
run diel_batched  1800 --problem dielectric --mode batched
run diel_batched8 1800 --problem dielectric --mode batched --chunk 8
# Two-phase restart: CPU-measured a LOSS with uniform iteration
# counts (sweep.py restart_tol note); try ONLY if diel_batched shows
# a straggler (max iters >> median in its log).
run diel_batched_rt 1800 --problem dielectric --mode batched --restart-tol 3e-3
run diel_chain4   1800 --problem dielectric --mode warm-chain --chain 4

# 5. Config-2 rods2d (first TPU record for the 2D dielectric axis).
run rods2d_warm   1200 --problem rods2d

echo "=== done; results in results/ab_r4/" >&2
