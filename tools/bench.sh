#!/bin/bash
# Local Bench runner: tools/bench.sh [TAG] [CPUS] [SF_DIR] [QUERY...] — assumes `sbt compile` is current.
# Mirrors the driver contract: SPARK_GRAFT_SF_DIR + SPARK_GRAFT_CPUS envs, graft.Bench main,
# one JSON line on stdout (captured to /tmp/graft_bench_<TAG>.json), full artifact stamped by
# SPARK_GRAFT_BENCH_TAG into bench_results/.
set -e
set -o pipefail
TAG="${1:-local}"
CPUS="${2:-32}"
SF="${3:-/root/testdata/sf0.1}"
shift 3 2>/dev/null || shift $# # remaining args = query subset
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_BENCH_TAG="$TAG" \
java $ADDOPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@"
