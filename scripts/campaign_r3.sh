#!/bin/bash
# Round-3 measurement campaign (runs sequentially; each stage appends to
# BENCH/BASELINE.md). Order:
#  1. impl comparison at 400k docs, local[16]  (doc vs fused vs columns)
#  2. fused scaling 4->16 @ 400k               (verdict task #2)
#  3. doc scaling 4->16 @ 800k, three consecutive runs (verdict task #5)
#  4. doc scaling 8->32 @ 800k                 (verdict task #6 evidence)
#  5. salted holistic-agg skew bench           (verdict task #7)
set -x
cd /root/repo
LOG=/tmp/campaign_r3.log
{
  echo "=== campaign start $(date)"

  echo "--- 1. impl comparison @400k local[16]"
  python scripts/bench_one.py 16 400000 2 doc
  python scripts/bench_one.py 16 400000 2 fused
  python scripts/bench_one.py 16 400000 2 columns

  echo "--- 2. fused scaling 4->16 @400k"
  python scripts/bench_scaling.py 400000 4 16 fused

  echo "--- 3. doc scaling 4->16 @800k x3"
  python scripts/bench_scaling.py 800000 4 16 doc
  python scripts/bench_scaling.py 800000 4 16 doc
  python scripts/bench_scaling.py 800000 4 16 doc

  echo "--- 4. doc scaling 8->32 @800k"
  python scripts/bench_scaling.py 800000 8 32 doc

  echo "--- 5. salted skew bench"
  python scripts/bench_salted.py 8000000 16

  echo "=== campaign end $(date)"
} >> "$LOG" 2>&1
