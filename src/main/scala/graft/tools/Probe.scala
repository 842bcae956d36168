package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway environment probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (t <- Seq("events", "embeddings", "orders", "documents", "lineitem")) {
      println(s"== $t")
      try {
        val df = spark.read.parquet(s"$sf/$t.parquet")
        df.printSchema()
        df.show(2, 60)
      } catch { case e: Throwable => println(s"ERR: ${e.getMessage}") }
    }
    // l_quantity integral?
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    import org.apache.spark.sql.functions._
    li.select(
      max(abs(col("l_quantity") - round(col("l_quantity")))).as("qty_frac"),
      min("l_shipdate").as("min_ship"), max("l_shipdate").as("max_ship")
    ).show(false)
    spark.stop()
  }
}
