#!/bin/bash
# Local Verify runner: tools/verify.sh [SF_DIR] [OUT_DIR] [NAME_FILTER] — assumes `sbt compile` is current.
# NAME_FILTER: optional comma-separated query names/prefixes for a fast subset run.
#
# tools/verify.sh --both
#   Round-close mode: full gate at BOTH sf0.01 and sf0.1 (run + DuckDB
#   compare each). The sf0.1 pass is standard, not a one-off — it caught a
#   real cross-engine divergence in round 7 (NULL-vs-empty array_to_string)
#   that no sf0.01 run could see.
set -e
set -o pipefail
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_one() {
  local SF="$1" OUT="$2" FILTER="$3"
  rm -rf "$OUT"
  # no exec: the || fallback must run in this shell to surface the log tail
  java $ADDOPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$SF" "$OUT" ${FILTER:+"$FILTER"} 2>/tmp/graft_verify.log || { tail -30 /tmp/graft_verify.log; exit 1; }
}

if [ "$1" = "--both" ]; then
  for sf in 0.01 0.1; do
    echo "=== gate @ sf$sf ==="
    run_one "/root/testdata/sf$sf" "/tmp/graft_verify_sf$sf" ""
    python3 "$(dirname "$0")/compare.py" "/root/testdata/sf$sf" "/tmp/graft_verify_sf$sf" | tail -3
  done
  exit 0
fi

run_one "${1:-/root/testdata/sf0.01}" "${2:-/tmp/graft_verify}" "${3:-}"
