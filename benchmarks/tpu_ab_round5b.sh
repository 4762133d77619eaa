#!/bin/bash
# Round-5b dielectric throughput queue (STATUS §0d-throughput: the
# field path is op-issue-latency-bound, so per-iteration cost is
# nearly independent of block size — test whether a LARGER block
# (more subspace per iteration ⇒ fewer iterations) is net-positive,
# and whether a shallower Chebyshev kernel projector survives at
# production size. NOTE the cheby boundary moved with size: at n=6
# p=3 cheby_steps(0.2)==cheby_steps(0.15)==5 (no-op); the one-fewer-
# step boundary is 0.3 -> 4 steps (checked on host, 2026-08-19).
# Run AFTER the CPU suite finishes (host-starvation rule).
set -u
cd "$(dirname "$0")/.."
source benchmarks/ab_lib.sh
ab_init results/ab_r5

run diel_block20   1200 --problem dielectric --block 20 --repeats 3
run diel_block24   1200 --problem dielectric --block 24 --repeats 3
run diel_cheby03   1200 --problem dielectric --cheby-target 0.3 --repeats 3
run diel_b20_cheby03 1200 --problem dielectric --block 20 --cheby-target 0.3 --repeats 3
# headline-block sanity: does the spectral engine also gain from m>16?
run warm_block20   900  --block 20 --repeats 3

echo "=== round5b done; results in $OUT" >&2
