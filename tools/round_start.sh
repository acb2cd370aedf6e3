#!/usr/bin/env bash
# Round-start green-tree gate (VERDICT r13 ask #6 / r14 ask #6): run
# BEFORE optimizing anything. Verifies compile, the full unit suite,
# and the sf0.01 oracle gate, then takes a round-start bench baseline
# so every before/after claim in OPTIMIZATION_r{N}.md compares
# SAME-DAY runs on this box (documented 2-4x environment swings make
# cross-day comparisons unusable).
#
# Usage: tools/round_start.sh [round-number]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-XX}"

echo "== 1/4 compile =="
sbt -batch compile 2>&1 | grep -E "^\[(error|success)\]" | tail -3

echo "== 2/4 unit suite =="
sbt -batch test 2>&1 | tail -3

echo "== 3/4 sf0.01 oracle gate =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/round_start_vout" \
  2>&1 | grep -E "\[verify\]" || true
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/round_start_vout \
  2>/dev/null | tail -1

echo "== 4/4 round-start bench baseline (full, sf0.1, 32 cores) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FULL="/tmp/BENCH_R${N}_START.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -F '"metric"' | tail -1 \
  | cut -c1-200
echo "baseline artifact: /tmp/BENCH_R${N}_START.json"
