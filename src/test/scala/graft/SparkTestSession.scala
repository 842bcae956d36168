package graft

import org.apache.spark.sql.SparkSession

/** One lazy local session shared across Spark-backed specs (mirrors the
  * reference's SparkRuntimeSpec session config: local, UI off, minimal
  * shuffle partitions).
  */
trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.session
}

object SparkTestSession {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(
        "spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_test_wh").toString
      )
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
