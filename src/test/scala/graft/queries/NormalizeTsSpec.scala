package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Guard for the testdata-drift shim: `events.ts` has shipped both as
  * parquet TIMESTAMP(NANOS) (read as Long under nanosAsLong) and
  * TIMESTAMP(MICROS) (read as a timestamp type) — round 10's 8-query
  * regression. Every consumer assumes epoch-ns BIGINT; normalizeTs must
  * deliver that for every physical encoding, and leave already-Long (and
  * ts-less) frames untouched.
  */
class NormalizeTsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("timestamp ts → epoch-ns Long, wall-clock-exact under UTC session tz") {
    // 2024-03-01T12:34:56.789012Z = 1709296496789012 µs since epoch
    val micros = 1709296496789012L
    val df = Seq(Tuple1(micros))
      .toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), lit(1L).as("x"))
    assert(df.schema("ts").dataType == TimestampType)
    val out = QueryDef.normalizeTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.select("ts").as[Long].head() == micros * 1000L)
    // column order preserved (ts stays first)
    assert(out.columns.toSeq == Seq("ts", "x"))
  }

  test("TIMESTAMP_NTZ ts normalizes identically (the round-10 encoding)") {
    val micros = 1709296496789012L
    val df = Seq(Tuple1(micros))
      .toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = QueryDef.normalizeTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.select("ts").as[Long].head() == micros * 1000L)
  }

  test("Long ts and ts-less frames pass through untouched") {
    val longTs = Seq((42L, "a")).toDF("ts", "s")
    assert(QueryDef.normalizeTs(longTs).collect().toSeq == longTs.collect().toSeq)
    val noTs = Seq((1L, "b")).toDF("id", "s")
    assert(QueryDef.normalizeTs(noTs).collect().toSeq == noTs.collect().toSeq)
  }
}
