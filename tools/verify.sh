#!/bin/bash
# Local Verify runner: tools/verify.sh [SF_DIR] [OUT_DIR] [NAME_FILTER] — assumes `sbt compile` is current.
# NAME_FILTER: optional comma-separated query names/prefixes for a fast subset run.
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_verify}
rm -rf "$OUT"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# no exec: the || fallback must run in this shell to surface the log tail
java $ADDOPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" ${3:+"$3"} 2>/tmp/graft_verify.log || { tail -30 /tmp/graft_verify.log; exit 1; }
