#!/usr/bin/env bash
# The full per-round evidence chain, one command.  Each stage writes
# the report the committed evidence in reports/ was produced from; run
# after any operator change and commit the refreshed reports with it.
#
# Usage: bash tools/verify_all.sh [round-tag]
# Default tag = newest CORRECTNESS_r{N}.json + 1 (the round being
# built), mirroring bench.py's inference — no per-round edit needed.
# Staleness guard (r9 ADVICE): if CORRECTNESS_r{N} exists but THIS
# round's reports do not (reports/evidence_audit_r{N}.txt missing), a
# late-in-round rerun after the driver landed CORRECTNESS_r{N} is
# still round N — naively inferring N+1 would mislabel the evidence.
set -uo pipefail
cd "$(dirname "$0")/.."
R="${1:-}"
if [ -z "$R" ]; then
  n=$(ls CORRECTNESS_r*.json 2>/dev/null \
      | sed -E 's/.*CORRECTNESS_r0*([0-9]+)\.json/\1/' | sort -n | tail -1)
  n="${n:-0}"
  if [ "$n" -gt 0 ] && [ ! -e "reports/evidence_audit_r${n}.txt" ]; then
    R="r$n"
  else
    R="r$(( n + 1 ))"
  fi
  echo "verify_all: round tag inferred as $R (pass one to override)"
fi
mkdir -p reports
fail=0

run() { # run <label> <outfile> <cmd...>
  local label="$1" out="$2"; shift 2
  echo "== $label -> $out"
  if ! "$@" >"$out" 2>/dev/null; then
    echo "   FAILED (see $out)"; fail=1
  else
    tail -1 "$out" | sed 's/^/   /'
  fi
}

run "oracle gate sf0.001" "reports/diff_oracle_${R}_sf0.001.txt" \
  python tools/diff_oracle.py --sf /root/testdata/sf0.001
run "oracle gate sf0.01" "reports/diff_oracle_${R}_sf0.01.txt" \
  python tools/diff_oracle.py
run "oracle gate sf0.1" "reports/diff_oracle_${R}_sf0.1.txt" \
  python tools/diff_oracle.py --sf /root/testdata/sf0.1
run "determinism sf0.01" "reports/determinism_${R}.txt" \
  python tools/determinism_check.py
run "determinism sf0.1" "reports/determinism_${R}_sf0.1.txt" \
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/determinism_check.py
run "plan lint" "reports/plan_lint_${R}.txt" python tools/plan_lint.py
run "scale probe (+decades)" "reports/scale_probe_${R}.txt" \
  python tools/scale_probe.py --x10 --x100 --xdedup --xemb --xraster
run "non-oracle pins" "reports/nonoracle_pins_${R}.txt" \
  python tools/nonoracle_pins.py
run "bench sf0.1" "/tmp/verify_bench_$R.json" \
  env SPARK_GRAFT_ROUND="$R" python bench.py
# tests run AFTER the report stages: test_contract's freshness gates
# (e.g. the committed determinism report must cover every CURRENT
# oracle key) validate the reports this script just wrote — running
# pytest first would red-bar any round that added an oracle key until
# the chain it is part of completes (the r11 chicken-and-egg)
run "tests" "/tmp/verify_pytest_$R.log" python -m pytest tests/ -q
run "evidence audit" "reports/evidence_audit_${R}.txt" \
  python tools/evidence_audit.py

echo
if [ "$fail" -eq 0 ]; then echo "ALL GATES GREEN"; else echo "GATE FAILURES — see above"; fi
exit "$fail"
