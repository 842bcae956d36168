package graft.sources

import graft.contracts._
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SaveMode, SparkSession}

/** Phantom-typed IO endpoints (reference: SparkCore.scala:24-29). */
final case class TypedSource[C](
    format: String,
    path: String,
    options: Map[String, String] = Map.empty
)

final case class TypedSink[C](
    path: String,
    mode: SaveMode = SaveMode.Overwrite,
    format: String = "parquet",
    options: Map[String, String] = Map.empty
)

/** Contract-pinned IO (reference: SparkCore.scala:343-367).
  *
  * Reads always force the contract-derived schema — schema inference is never
  * used, so the scan's `ReadSchema` is exactly the contract's columns and
  * DataSource V2 pushdown/pruning stay intact at any scale. The defensive pin
  * after load is plan-metadata-only: no data is read for it.
  */
object TypedIO {

  /** Read a DF from a typed source, force the contract schema, pin. */
  def readDF[C](src: TypedSource[C])(implicit spark: SparkSession, sch: ShapeOf[C]): DataFrame = {
    val reader = spark.read.format(src.format).options(src.options)
    val df = reader.schema(sch.struct).load(src.path)
    SchemaCheck.assertMatchesContract[C](df)
    df
  }

  /** Write a DF to a typed sink after a policy-aware defensive pin. */
  def writeDF[C, P <: SchemaPolicy with Singleton](df: DataFrame, sink: TypedSink[C])(implicit
      sch: ShapeOf[C],
      p: ValueOf[P]
  ): Unit = {
    SchemaCheck.assertMatchesContract[C, P](df)
    df.write.format(sink.format).mode(sink.mode).options(sink.options).save(sink.path)
  }

  /** Parquet -> typed Dataset via encoder. */
  def read[A: Encoder](path: String)(implicit spark: SparkSession): Dataset[A] =
    spark.read.parquet(path).as[A]

  /** Typed Dataset -> sink. */
  def write[A: Encoder](ds: Dataset[A], sink: TypedSink[A]): Unit =
    ds.write.mode(sink.mode).format(sink.format).options(sink.options).save(sink.path)
}
