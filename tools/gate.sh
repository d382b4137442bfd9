#!/usr/bin/env bash
# One-command replica of the driver's per-round gate — the engine's CI
# (the reference ships .github/workflows/ci-cd.yaml; this is the
# sbt-project equivalent, runnable on any box with the testdata).
#
#   tools/gate.sh [--skip-bench] [--skip-test]
#
# Runs, in order, failing fast:
#   1. sbt compile
#   2. sbt test                      (full ScalaTest suite)
#   3. graft.Verify @ sf0.01 + DuckDB oracle compare  (the t2 gate)
#   4. graft.Bench  @ sf0.1          (only if the box is quiet)
#
# Bench discipline (BENCH_NOTES.md): a contended box reads 10-30x high,
# so the bench step checks 1-min loadavg first and SKIPS with a warning
# rather than record garbage. Set SPARK_GRAFT_MAX_LOAD to override the
# quiet threshold (default 8 on this 32-cpu box).

set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_BENCH=0; SKIP_TEST=0
for a in "$@"; do
  case "$a" in
    --skip-bench) SKIP_BENCH=1 ;;
    --skip-test)  SKIP_TEST=1 ;;
    *) echo "usage: tools/gate.sh [--skip-bench] [--skip-test]" >&2; exit 2 ;;
  esac
done

echo "== gate 1/4: compile =="
sbt -batch compile

if [[ "$SKIP_TEST" == 0 ]]; then
  echo "== gate 2/4: sbt test =="
  sbt -batch test
else
  echo "== gate 2/4: sbt test SKIPPED (--skip-test) =="
fi

echo "== gate 3/4: verify vs DuckDB oracle @ sf0.01 =="
OUT=$(mktemp -d /tmp/graft_gate_verify.XXXXXX)
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" > /dev/null
python3 tools/check_oracle.py "$OUT" /root/testdata/sf0.01

if [[ "$SKIP_BENCH" == 0 ]]; then
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  MAX_LOAD=${SPARK_GRAFT_MAX_LOAD:-8}
  if python3 -c "exit(0 if float('$LOAD') <= float('$MAX_LOAD') else 1)"; then
    echo "== gate 4/4: bench @ sf0.1 (loadavg $LOAD, quiet) =="
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
      2>/dev/null | grep '"metric"'
  else
    echo "== gate 4/4: bench SKIPPED — loadavg $LOAD > $MAX_LOAD (contended" \
         "numbers are noise; re-run on a quiet box) =="
  fi
else
  echo "== gate 4/4: bench SKIPPED (--skip-bench) =="
fi

echo "== gate: ALL GREEN =="
