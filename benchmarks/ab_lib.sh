# Shared A/B runner helpers (ADVICE r4: run() was duplicated between
# tpu_ab_round4.sh and tpu_ab_priority.sh and results from different
# code revisions silently overwrote each other).
#
# Usage (from a script in benchmarks/):
#   source "$(dirname "$0")/ab_lib.sh"
#   ab_init results/ab_r5        # -> results/ab_r5/<shorthash>/
#   run <name> <timeout_s> [bench.py args...]
#
# Each run writes $OUT/<name>.json + $OUT/<name>.log; the header file
# $OUT/HEAD records the exact commit (+dirty marker) the runs came from.

ab_init() {
  local base="$1"
  local head
  head=$(git rev-parse --short HEAD 2>/dev/null || echo nogit)
  # PROGRESS.jsonl is appended by the round driver every ~15 min;
  # it is not code, so it must not mark a measurement run as dirty.
  if ! git diff --quiet -- . ':(exclude)PROGRESS.jsonl' 2>/dev/null; then
    head="${head}-dirty"
  fi
  OUT="$base/$head"
  mkdir -p "$OUT"
  { echo "commit: $(git rev-parse HEAD 2>/dev/null)"
    echo "date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
    git diff --stat 2>/dev/null
  } > "$OUT/HEAD"
  echo "=== A/B results -> $OUT" >&2
}

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "=== $name: python bench.py $* (timeout ${tmo}s)" >&2
  if timeout "$tmo" python bench.py "$@" \
       > "$OUT/$name.json" 2> "$OUT/$name.log"; then
    echo "$name: $(tail -1 "$OUT/$name.json")"
  else
    echo "FAILED/TIMEOUT: $name (see $OUT/$name.log)" >&2
    echo "{\"failed\": \"$name\", \"note\": \"nonzero exit or timeout ${tmo}s\"}" \
      > "$OUT/$name.FAILED.json"
  fi
}
