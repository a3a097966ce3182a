#!/usr/bin/env bash
# Summarize the just-finished `sbt test` run's JUnit XML reports
# (sbt writes target/test-reports/*.xml per suite) into a one-line
# committed artifact, so a round's closing claim and its evidence of
# record cannot diverge silently: target/ is overwritten by every later
# run, which is how r16's "final suite re-run green (554/0)" commit
# ended up contradicted by a 554/4 report on disk.
#
# Usage: tools/suite_report.sh SUITE_r17.json   (run right after sbt test)
set -euo pipefail
out="${1:?usage: suite_report.sh <out.json>}"
dir="target/test-reports"
[ -d "$dir" ] || { echo "no $dir — run sbt test first" >&2; exit 1; }

suites=0 tests=0 failures=0 errors=0 skipped=0
failing_suites=""
for f in "$dir"/*.xml; do
  header=$(grep -o '<testsuite[^>]*>' "$f" | head -1)
  attr() { echo "$header" | grep -o "$1=\"[0-9]*\"" | head -1 | grep -o '[0-9]*' || echo 0; }
  t=$(attr tests); fl=$(attr failures); er=$(attr errors); sk=$(attr skipped)
  suites=$((suites + 1)); tests=$((tests + t))
  failures=$((failures + fl)); errors=$((errors + er)); skipped=$((skipped + sk))
  if [ "$((fl + er))" -gt 0 ]; then
    name=$(echo "$header" | sed -n 's/.*name="\([^"]*\)".*/\1/p')
    failing_suites="$failing_suites\"$name\","
  fi
done
failing_suites="[${failing_suites%,}]"

newest=$(ls -t "$dir"/*.xml | head -1)
oldest=$(ls -tr "$dir"/*.xml | head -1)
run_start=$(date -u -r "$oldest" +%Y-%m-%dT%H:%M:%SZ)
run_end=$(date -u -r "$newest" +%Y-%m-%dT%H:%M:%SZ)
sha=$(git rev-parse HEAD 2>/dev/null || echo unknown)
dirty=$(git status --porcelain 2>/dev/null | grep -cv '^$' || true)

line=$(printf '{"suites":%d,"tests":%d,"failures":%d,"errors":%d,"skipped":%d,"failing_suites":%s,"report_oldest_utc":"%s","report_newest_utc":"%s","git_sha":"%s","uncommitted_files_at_report":%d,"written_utc":"%s"}' \
  "$suites" "$tests" "$failures" "$errors" "$skipped" "$failing_suites" \
  "$run_start" "$run_end" "$sha" "$dirty" "$(date -u +%Y-%m-%dT%H:%M:%SZ)")
echo "$line" | tee "$out"
