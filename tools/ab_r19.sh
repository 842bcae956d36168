#!/bin/bash
# Alternating same-box A/B of the inherited Lloyd-fuse commit (8e842e1, "new")
# vs the judged round-18 tree (c9d3182, "old" — worktree /root/wt_r18judged),
# on the kmeans/PQ-fit query family plus untouched controls. 2 reps per arm,
# old/new alternating, serial, full Bench subset protocol in both arms.
set -e
set -o pipefail
QUERIES="llm_ann_ivf_kmeans llm_semdedup llm_ann_ivf_pq llm_ann_ivf_pq_recall llm_ann_kmeans_recall llm_ann_ivf llm_ann_lsh llm_multimodal_decode"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_arm () { # $1 = repo dir, $2 = tag
  cd "$1"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_TAG="$2" \
  java $ADDOPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench $QUERIES > "/tmp/ab_$2.out" 2>&1
  echo "[ab] $2 rc=$?"
}
run_arm /root/wt_r18judged r19ab_old_1
run_arm /root/repo        r19ab_new_1
run_arm /root/wt_r18judged r19ab_old_2
run_arm /root/repo        r19ab_new_2
echo "[ab] all done"
