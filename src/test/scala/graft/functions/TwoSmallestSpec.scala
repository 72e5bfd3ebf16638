package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TwoSmallestSpec extends SparkSpec {

  test("equals (min, exclude-the-min second min) on distinct values, across partial/merge boundaries") {
    import spark.implicits._
    // 1,000 (key, value) rows over 7 keys, values distinct per key,
    // spread over 8 partitions so every group crosses partial-agg and
    // merge boundaries — the buffer-combine path, not just update
    val rows = (0 until 1000).map(i => ((i % 7).toLong, (i * 37 % 1000).toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val got = df.groupBy("k")
      .agg(TwoSmallest(col("v")).as("m"))
      .select(col("k"), col("m.m1"), col("m.m2"))
      .as[(Long, Long, Long)].collect()
      .map { case (k, m1, m2) => k -> ((m1, m2)) }.toMap
    val want = rows.groupBy(_._1).map { case (k, g) =>
      val sorted = g.map(_._2).distinct.sorted
      k -> (sorted(0), sorted(1))
    }
    assert(got === want)
  }

  test("singleton yields (v, null); empty-after-nulls yields (null, null); nulls are skipped") {
    import spark.implicits._
    val df = Seq(
      ("solo", Some(5L)),
      ("nulls", None), ("nulls", None),
      ("mixed", None), ("mixed", Some(9L)), ("mixed", Some(3L))
    ).toDF("k", "v").repartition(4)
    val got = df.groupBy("k").agg(TwoSmallest(col("v")).as("m"))
      .select(col("k"), col("m.m1"), col("m.m2"))
      .collect().map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got("solo") === (Some(5L), None))
    assert(got("nulls") === (None, None))
    assert(got("mixed") === (Some(3L), Some(9L)))
  }

  test("multiset semantics: a duplicated minimum fills both slots") {
    import spark.implicits._
    // documented divergence from min(when(v =!= min_v, v)) — the
    // pigeonhole engine's ids are row-unique so it never sees this, but
    // the contract must hold for any future caller
    val got = Seq(("k", 5L), ("k", 5L), ("k", 7L)).toDF("k", "v")
      .repartition(3)
      .groupBy("k").agg(TwoSmallest(col("v")).as("m"))
      .select(col("m.m1"), col("m.m2")).as[(Long, Long)].head()
    assert(got === ((5L, 5L)))
  }

  test("SQL registration: two_smallest works through expr() and GROUP BY") {
    import spark.implicits._
    val got = Seq((1L, 30L), (1L, 10L), (1L, 20L), (2L, 7L))
      .toDF("k", "v").repartition(3)
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.expr("two_smallest(v)").as("m"))
      .select(col("k"), col("m.m1"), col("m.m2"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got(1L) === ((10L, Some(20L))))
    assert(got(2L) === ((7L, None)))
  }

  test("orders strings lexically (non-numeric key types)") {
    import spark.implicits._
    val got = Seq("pear", "apple", "quince", "banana").toDF("v")
      .repartition(2)
      .agg(TwoSmallest(col("v")).as("m"))
      .select(col("m.m1"), col("m.m2")).as[(String, String)].head()
    assert(got === (("apple", "banana")))
  }
}
