package graft.relational

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private lazy val big = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"), (1L, "f")
  ).toDF("k", "v")
  private lazy val small = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("sk", "name")

  test("saltedJoin result equals the plain join (salt-invariant)") {
    val plain = big.join(small, col("k") === col("sk")).select("k", "v", "name")
    val salted = Scale.saltedJoin(big, small, "k", "sk", saltFactor = 4).select("k", "v", "name")
    assert(salted.collect().sortBy(_.toString).toSeq == plain.collect().sortBy(_.toString).toSeq)
  }

  test("saltedCount equals the plain groupBy count") {
    val plain = big.groupBy("k").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().sorted
    val salted = Scale.saltedCount(big, "k", saltFactor = 4).as[(Long, Long)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("bucketedJoin is shuffle-free at read time (no Exchange before the join)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
      val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "rv")
      val joined = Scale.bucketedJoin(spark, left, right, "graft_spec_l", "graft_spec_r", "k", buckets = 4)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("partitioned write + filter prunes partitions (PartitionFilters, not post-scan discard)") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    (1 to 40)
      .map(i => (i.toLong, 2020 + i % 4))
      .toDF("id", "yr")
      .write
      .partitionBy("yr")
      .mode("overwrite")
      .parquet(s"$out/t")
    val q = spark.read.parquet(s"$out/t").filter(col("yr") === 2021)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("(yr"), scan) // the year predicate landed in PartitionFilters
    assert(q.count() == 10L)
  }

  test("q1/q3-style scans push filters into the parquet reader") {
    // pushdown guard: a date-filtered scan must carry PushedFilters — a
    // regression here silently turns a pruned 100 TB scan into a full one
    val sf = "/root/testdata/sf0.001"
    val q = spark.read
      .parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") < 10.0 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("LessThan(l_quantity") || plan.contains("IsNotNull(l_quantity"), plan)
    // column pruning: the scan reads only the needed columns
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_comment"), "scan reads unneeded columns:\n" + plan)
  }

  test("WeightedAvg aggregator: exact integral sums") {
    val data = Seq(("a", 100L, 2L), ("a", 200L, 1L), ("b", 50L, 4L)).toDS()
    val out = data
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(WeightedAvg.toColumn)
      .collect()
      .toMap
    assert(out("a") == ((100L * 2 + 200L * 1, 3L)))
    assert(out("b") == ((200L, 4L)))
  }
}
