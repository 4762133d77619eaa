#!/bin/bash
# Round-5 confirmation queue — run AFTER tpu_ab_round5.sh.
#
# The main campaign left two single-pass candidate winners within 4% of
# the 3-pass control (chain4_bsetup 6.89, warm_pcfactor 6.83 vs warm
# 6.61 median, pass band 6.58-6.70): confirm with medians, try the
# combination, re-try the one compile-timeout, and measure the would-be
# default (chain4_bsetup at the headline nk=16) before any flip.
set -u
cd "$(dirname "$0")/.."
source benchmarks/ab_lib.sh
ab_init results/ab_r5

run chain4_bsetup_x3   1200 --mode warm-chain --chain 4 --pc-mode batched-setup --nk 32 --repeats 3
run warm_pcfactor_x3   1200 --pc-rep factor --repeats 3
run chain4_bsetup_factor_x3 1200 --mode warm-chain --chain 4 --pc-mode batched-setup --pc-rep factor --nk 32 --repeats 3
run chain4_bsetup_nk16 1200 --mode warm-chain --chain 4 --pc-mode batched-setup --nk 16 --repeats 3
# chain8_bsetup compile-timed-out at 900 s while chain16 compiled in
# 48 s — transient worker stall suspected; one retry at 1800 s.
run chain8_bsetup_retry 1800 --mode warm-chain --chain 8 --pc-mode batched-setup --nk 32

echo "=== confirm done; results in $OUT" >&2
