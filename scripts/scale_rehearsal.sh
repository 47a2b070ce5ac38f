#!/usr/bin/env bash
# Repeatable scale rehearsal: derive an N-times copy of the sf0.1
# testdata under /tmp (graft.tools.ScaleData — key-shifted fact
# unions, verbatim dims/corpora) and time a query subset at 1x and Nx
# with the same Bench methodology (fresh JVM per scale, RUNS as
# given, per-query min across interleaved passes).
#
# Usage: scripts/scale_rehearsal.sh [factor] [queryPrefixCsv] [runs]
#   factor          scale multiple (default 30)
#   queryPrefixCsv  SPARK_GRAFT_BENCH_ONLY filter
#                   (default vt5,vt7,cf2,s9_data_merge,h3 — the top-5
#                    lake queries per VERDICT r7)
#   runs            Bench passes per scale (default 2)
#
# Output: /tmp/scale_rehearsal/bench_1x.json and bench_<N>x.json
# (full per-query maps), plus both stdout JSON lines.
set -euo pipefail
cd "$(dirname "$0")/.."

FACTOR="${1:-30}"
ONLY="${2:-vt5,vt7,cf2,s9_data_merge,h3}"
RUNS="${3:-2}"
SRC=/root/testdata/sf0.1
OUT=/tmp/scale_rehearsal
# 'c' suffix: corpus-scaled derivation (documents/embeddings too,
# letter-permutation / sign-flip salted — see graft.tools.ScaleData)
DERIVED="$OUT/sf0.1_x${FACTOR}c"
mkdir -p "$OUT"

if [ ! -d "$DERIVED/lineitem.parquet" ]; then
  echo "== deriving ${FACTOR}x data under $DERIVED"
  sbt -batch "runMain graft.tools.ScaleData $SRC $DERIVED $FACTOR corpus"
else
  echo "== reusing existing $DERIVED"
fi

run_scale() { # $1 = data dir, $2 = label
  echo "== bench $2 ($1)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_ONLY="$ONLY" \
    SPARK_GRAFT_BENCH_RUNS="$RUNS" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '^{"metric"' \
    | tee "$OUT/bench_$2.json"
}

run_scale "$SRC" 1x
run_scale "$DERIVED" "${FACTOR}x"

python3 - "$OUT/bench_1x.json" "$OUT/bench_${FACTOR}x.json" <<'EOF'
import json, sys
a = json.load(open(sys.argv[1])); b = json.load(open(sys.argv[2]))
print(f"\n{'query':24s} {'1x':>8s} {'Nx':>8s} {'ratio':>6s}")
for q in sorted(a["queries"]):
    x, y = a["queries"][q], b["queries"].get(q)
    print(f"{q:24s} {x:8.2f} {y:8.2f} {y/x:6.1f}" if y else f"{q}: missing at Nx")
EOF
