#!/bin/bash
# Round-end gate sequence (VERDICT r6 item 6: bench_diff wired as a
# mechanical gate, plus every verification layer the round workflow
# runs before handing the repo to the driver). Exits non-zero on the
# first failing gate.
#
# Usage: tools/round_gates.sh <prev_bench_capture> [round_tag]
#   e.g. tools/round_gates.sh tools/bench_captures/r7_local_sf01_stderr.txt r8
# Extra args after the tag go to bench_diff (e.g. a documented
# "--allow query=reason" for a deliberate scope change).
#
# Layers (each independently catches a class of regression):
#   1. pytest              — unit/property/plan/invariance suites
#                            (measured total appended to the round's
#                            gates-summary file so round notes can't
#                            drift from what actually ran — VERDICT r8
#                            item 6)
#   2. verify_local 0.001  — fast full-catalog oracle gate
#   3. verify_local 0.01   — driver-scale oracle gate
#   4. VERIFY_PLAIN 0.01   — same, under a bare driver-style session
#   5. verify_local 0.1    — full-catalog oracle sweep at the BENCH
#                            scale factor (standing since r9, formerly
#                            "gate 4.5" — VERDICT r8 item 8: the only
#                            value check at the bench-graded scale)
#   6. differential 0 1    — full catalog on pathological + random data
#   6.5 mutation_check     — one deliberate defect per planted-truth
#                            certificate family must break its oracle
#                            hash (standing since r14 — the discipline
#                            that found the r13 Avro union-index bug)
#   (informational: regenerate PLANS.md — formerly "gate 5.5")
#   7. bench sf0.1         — full-catalog timing, stderr capture kept
#   8. bench_diff          — per-query wall regression vs prev round
# pipefail is load-bearing: gates 1 and 5 pipe through tee/sed to
# record their measured totals, and without it a failing pytest or
# verify run would be masked by the recorder's exit 0
set -e -o pipefail
cd "$(dirname "$0")/.."

PREV="${1:?usage: round_gates.sh <prev_bench_capture> [round_tag]}"
TAG="${2:-next}"
CAP="tools/bench_captures/${TAG}_local_sf01_stderr.txt"
SUMMARY="tools/bench_captures/${TAG}_gates_summary.txt"

echo "round_gates $TAG: started $(date -u +%FT%TZ)" > "$SUMMARY"

# any gate abort (set -e) records a FAILED line, so a partially-written
# summary is never ambiguous about whether the chain died or is still
# running (ADVICE r9); gate 8/8 writes its own more specific line
# before its explicit exit, which does not retrigger ERR
trap 'echo "round_gates $TAG: FAILED $(date -u +%FT%TZ) (see last gate header in the chain log)" >> "$SUMMARY"' ERR

echo "== gate 1/8: pytest =="
python -m pytest tests/ -q | tee /tmp/round_gates_pytest.out
# the measured totals line (e.g. "252 passed, 1 skipped in 654s") —
# recorded so COVERAGE.md round notes quote a number that actually ran;
# `|| echo` so a pytest run with no 'N passed' token (all-skipped /
# deselected) can't abort a green chain under pipefail (ADVICE r9)
grep -E '[0-9]+ passed' /tmp/round_gates_pytest.out | tail -1 \
  | sed 's/^/pytest: /' >> "$SUMMARY" \
  || echo 'pytest: (no passed-total line found)' >> "$SUMMARY"

echo "== gate 2/8: verify_local sf0.001 =="
SPARK_GRAFT_CPUS=8 python tools/verify_local.py /root/testdata/sf0.001

echo "== gate 3/8: verify_local sf0.01 =="
SPARK_GRAFT_CPUS=16 python tools/verify_local.py /root/testdata/sf0.01

echo "== gate 4/8: VERIFY_PLAIN sf0.01 (bare session) =="
VERIFY_PLAIN=1 SPARK_GRAFT_CPUS=16 python tools/verify_local.py /root/testdata/sf0.01

echo "== gate 5/8: verify_local sf0.1 (full catalog at bench scale) =="
SPARK_GRAFT_CPUS=32 python tools/verify_local.py /root/testdata/sf0.1 \
  | tee /tmp/round_gates_verify_sf01.out
tail -1 /tmp/round_gates_verify_sf01.out | sed 's/^/verify_sf0.1: /' >> "$SUMMARY"

echo "== gate 6/8: randomized differential (seeds 0 1) =="
python tools/differential_random_full.py 0 1

echo "== gate 6.5/8: certificate mutation sweep =="
# VERDICT r13 item 4 (standing since r14): one deliberate defect per
# planted-truth certificate family must BREAK its oracle hash — an
# insensitive certificate is green-washing and fails the chain
python tools/mutation_check.py /root/testdata/sf0.001 \
  | tee /tmp/round_gates_mutation.out
tail -1 /tmp/round_gates_mutation.out | sed 's/^/mutation_check: /' >> "$SUMMARY"

echo "== informational gate: regenerate PLANS.md =="
# informational, not failing: the shuffle/join counts land in git diff
# for round-over-round review (plan_report has mild AQE run-to-run
# variance on single counts — the bench gate is the cost arbiter).
# Temp-file + mv so a plan_report crash neither truncates the
# committed audit nor aborts the chain under set -e.
if python tools/plan_report.py > PLANS.md.tmp 2>/dev/null; then
  mv PLANS.md.tmp PLANS.md
else
  rm -f PLANS.md.tmp
  echo "plan_report failed — keeping the committed PLANS.md (informational gate)"
fi
git diff --stat PLANS.md || true

echo "== gate 7/8: bench sf0.1 (capture -> $CAP) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  python bench.py 2>"$CAP"

echo "== gate 8/8: bench_diff vs $PREV =="
# deliberate scope changes (a query made bigger on purpose) will trip
# the 1.5x gate: inspect the table, document the reason in the round
# notes, and commit it under tools/bench_captures/
DIFF_OK=0
python tools/bench_diff.py "$PREV" "$CAP" --threshold 1.5 "${@:3}" \
  | tee /tmp/round_gates_bench_diff.out || DIFF_OK=$?
# record the totals AND the verdict lines (regressions / allowances /
# stale allows) BEFORE gating on the exit code, so the summary alone
# tells whether and WHY the gate passed or failed — round notes must
# never need a hand-appended verdict
grep -E '^(common|cpu probe|shuffle probe|sort probe|uniform drift|unexplained|uniform-drift gate|[0-9]+ regression|[0-9]+ allowed|stale --allow)' \
  /tmp/round_gates_bench_diff.out >> "$SUMMARY" || true
if [ "$DIFF_OK" -ne 0 ]; then
  echo "round_gates $TAG: FAILED at gate 8 (bench_diff exit $DIFF_OK)" >> "$SUMMARY"
  exit "$DIFF_OK"
fi

echo "ALL GATES GREEN"
echo "round_gates $TAG: ALL GATES GREEN $(date -u +%FT%TZ)" >> "$SUMMARY"
echo "-- summary ($SUMMARY) --"
cat "$SUMMARY"
