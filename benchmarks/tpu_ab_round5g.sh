#!/bin/bash
# Round-5g paired headline control (STATUS §0f promised §0g): the
# round-5b warm_block20 single run (7.10, band 7.08-7.13) nominally
# beat the §0e pcfactor record 7.05 (6.71-7.09) but the bands overlap.
# Decide by a PAIRED same-session design: control (m=16) and m=20
# interleaved A/B/A/B so tunnel/worker drift cancels; each arm is two
# x3-median bench passes. Judge: flip the default block only if every
# m=20 median beats every paired m=16 median (non-overlapping pairs).
# Run with NO concurrent CPU-heavy job (host-starvation rule).
set -u
cd "$(dirname "$0")/.."
source benchmarks/ab_lib.sh
ab_init results/ab_r5

run g_ctrl_a 900 --repeats 3
run g_b20_a  900 --block 20 --repeats 3
run g_ctrl_b 900 --repeats 3
run g_b20_b  900 --block 20 --repeats 3

echo "=== round5g done; results in $OUT" >&2
