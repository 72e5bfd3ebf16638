package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canary for testdata `events.ts` encoding drift.
  *
  * The driver's events.parquet has shipped three different physical
  * encodings across rounds — TIMESTAMP(NANOS) (readable only as a ns Long),
  * µs `isAdjustedToUTC=true` (TimestampType), and µs `isAdjustedToUTC=false`
  * (TIMESTAMP_NTZ under default inference). Each switch silently crashed
  * every `unix_micros(ts)` call site. This spec writes the same instants in
  * all three shapes and pins that [[Tables.normalizeEventTs]] lands them on
  * byte-identical TimestampType micros, so the next encoding flip fails HERE
  * with a readable diff instead of taking out seven queries.
  */
class EventTsEncodingSpec extends SparkSpec {

  private val micros = Seq(
    0L,                      // epoch
    1700000000000000L,       // 2023-11-14T22:13:20Z
    1755043200123000L,       // ms-grain value like the real testdata
    -3600000000L)            // pre-epoch hour

  test("normalizeEventTs: ns-long, us-LTZ, us-NTZ encodings all yield identical unix_micros") {
    import spark.implicits._
    val dir = tmpDir("ts-canary")
    val base = micros.toDF("us")

    base.select(timestamp_micros($"us").as("ts")).write.parquet(s"$dir/ltz")
    base.select(timestamp_micros($"us").cast(TimestampNTZType).as("ts")).write.parquet(s"$dir/ntz")
    base.select(($"us" * 1000L).as("ts")).write.parquet(s"$dir/ns")

    // Sanity: the three files really do read back as three distinct types
    // (otherwise this spec isn't testing what it claims to).
    val ltz = spark.read.parquet(s"$dir/ltz")
    val ntz = spark.read.parquet(s"$dir/ntz")
    val ns  = spark.read.parquet(s"$dir/ns")
    assert(ltz.schema("ts").dataType == TimestampType)
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    assert(ns.schema("ts").dataType == LongType)

    def normed(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == TimestampType,
        s"normalizeEventTs left ts as ${out.schema("ts").dataType}")
      out.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted
    }

    val expected = micros.sorted
    assert(normed(ltz) == expected)
    assert(normed(ntz) == expected)
    assert(normed(ns) == expected)
  }

  test("the real testdata events table normalizes to TimestampType and unix_micros works") {
    val sf = "/root/testdata/sf0.001"
    val df = Tables.eventsTs(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts normalized to ${df.schema("ts").dataType} — new encoding drift? " +
        "Check the parquet footer and add an arm to Tables.normalizeEventTs.")
    // the exact call shape that crashed in round 6
    assert(df.select(unix_micros(col("ts"))).limit(1).count() == 1L)
  }
}
