#!/bin/bash
# Alternating stash-A/B timing harness (r13): the box swings 2-3x between
# sessions, so BEFORE (stashed r12 code) and AFTER (working tree) sessions
# are interleaved A,B,A,B and each session carries an untouched CONTROL
# query to normalize. Usage: scripts/ab_r13.sh q1 q2 ...
set -e
cd "$(dirname "$0")/.."
QUERIES="$@"
CONTROL="pricing_summary agg_orders_by_status"
for round in 1 2; do
  git stash push -q -m "ab_r13" -- pyspark_cdc_engine
  echo "=== BEFORE round $round ==="
  python scripts/profile_r13.py --no-plan --tag ab_before --runs 3 $CONTROL $QUERIES 2>/dev/null | grep ": \["
  git stash pop -q
  echo "=== AFTER round $round ==="
  python scripts/profile_r13.py --no-plan --tag ab_after --runs 3 $CONTROL $QUERIES 2>/dev/null | grep ": \["
done
