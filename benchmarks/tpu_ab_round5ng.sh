#!/bin/bash
# Round-5 near-Γ loose-stop A/B (STATUS §0d-throughput lever 2): the
# two smallest-|k| config-3 points burn 21-24% of ALL sweep iterations
# grinding the certified-benign f32 deflation-roundoff floor (~1e-3)
# against the 1e-4 field stop until the stagnation guard fires.
# near_gamma_tol=2e-3 exits them at the certified region instead
# (benchmarks/certify_dielectric.py: the 1.65e-3 guard exit refines to
# 1.86e-7 relative). Paired design: ON (bench default) vs OFF
# (--near-gamma-tol 0, bit-identical to the b907236 2.66 record path),
# interleaved. Run with NO concurrent CPU-heavy job.
set -u
cd "$(dirname "$0")/.."
source benchmarks/ab_lib.sh
ab_init results/ab_r5

run diel_ng_a   1200 --problem dielectric --repeats 3
run diel_off_a  1200 --problem dielectric --near-gamma-tol 0 --repeats 3
run diel_ng_b   1200 --problem dielectric --repeats 3

echo "=== round5ng done; results in $OUT" >&2
