package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SQL-callable native expressions. The suite JVM shares one session, so
  * this registers post-creation via `GraftExtensions.register` (identical
  * registrations); the `spark.sql.extensions` config path is driven
  * end-to-end by `graft.tools.SqlFunctionsDemo` in a fresh JVM.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.SparkTestSession.session
    GraftExtensions.register(s)
    s
  }

  test("native expressions callable from SQL via spark.sql.extensions") {
    val row = spark
      .sql(
        """SELECT
          |  simhash64(split('the quick brown fox', ' ')) AS sh,
          |  size(minhash_signature(token_shingles(split('a b c d e', ' '), 3), 16)) AS sig_len,
          |  token_shingles(split('a b c d', ' '), 3) AS shingles,
          |  token_windows(split('a b a b c', ' '), 2) AS windows,
          |  array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |  round(array_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS cos_same
          |""".stripMargin
      )
      .head()
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Int]("sig_len") == 16)
    assert(row.getSeq[String](row.fieldIndex("shingles")).toList == List("a b c", "b c d"))
    // duplicates kept, positional order — unlike the distinct shingle set
    assert(row.getSeq[String](row.fieldIndex("windows")).toList == List("a b", "b a", "a b", "b c"))
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Double]("cos_same") == 1.0)
  }

  test("SQL results agree with the DataFrame API wrappers") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("x y z w v").toDF("text")
    val viaSql = df.selectExpr("simhash64(split(text, ' ')) AS s").as[Long].head()
    val viaApi = df.select(graft.llmops.Fingerprints.simhash64(col("text")).as("s")).as[Long].head()
    assert(viaSql == viaApi)
  }

  test("native expressions generate real code (static NativeMath calls, no fallback)") {
    import spark.implicits._
    // AQE wraps the plan before codegen stages exist; disable it here so
    // codegenString sees the WholeStageCodegen subtree pre-execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = Seq((1L, "the quick brown fox", Seq(1.0f, 2.0f)), (2L, "b c d e", Seq(0.5f, -1.0f)))
      .toDF("id", "text", "v")
      .repartition(2) // keep a real exec stage — ConvertToLocalRelation would pre-evaluate the projection
      .select(
        graft.llmops.Fingerprints.simhash56Md5(col("text")).as("s56"),
        graft.llmops.Fingerprints.simhash64(col("text")).as("s64"),
        graft.llmops.Similarity.cosine(col("v"), col("v")).as("c")
      )
    val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(gen.contains("graft.functions.NativeMath.simhash56Md5"), gen.take(2000))
    assert(gen.contains("graft.functions.NativeMath.cosine"), gen.take(2000))
    // with fallback disabled a Janino error would throw instead of silently
    // reverting to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = df.as[(Long, Long, Double)].collect()
      assert(rows.length == 2 && rows.forall(r => math.abs(r._3 - 1.0) < 1e-12))
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("native expressions participate in Catalyst constant folding") {
    GraftExtensions.register(spark)
    // literal arguments: the optimizer must fold the whole call to a
    // Literal — per-row evaluation of a constant would be wasted work on
    // every row of a 100 TB scan
    val plan = spark
      .sql("SELECT simhash56_md5(split('a b c', ' ')) AS s, array_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c")
      .queryExecution
      .optimizedPlan
      .toString
    assert(!plan.contains("simhash56_md5"), plan)
    assert(!plan.contains("array_cosine"), plan)
  }
}
