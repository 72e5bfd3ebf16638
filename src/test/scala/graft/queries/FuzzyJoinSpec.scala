package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Losslessness proof for f20's deletion-neighborhood blocking: the
  * blocked fuzzy self-join must return EXACTLY the pairs an all-pairs
  * levenshtein ≤ 1 scan returns. The DuckDB oracle mirrors the blocking
  * algebra (an n² oracle at sf0.1 is 225M levenshtein calls), so this
  * spec carries the blocked ≡ brute-force evidence instead — on the
  * real customer table AND on a synthetic frame that exercises the
  * insert/delete cases the same-length customer names never hit.
  */
class FuzzyJoinSpec extends SparkSpec {

  private def f20(dir: String) =
    graft.SparkEntry.queries("f20_fuzzy_pairs_blocked")(spark, dir)

  test("blocked == brute-force on the sf0.001 customer table") {
    val dir = "/root/testdata/sf0.001"
    val got = f20(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val c = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    val brute = c.as("a").crossJoin(c.as("b"))
      .filter(col("a.c_custkey") < col("b.c_custkey"))
      .withColumn("dist", levenshtein(col("a.c_name"), col("b.c_name")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("a.c_custkey"), col("b.c_custkey"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("insert/delete neighbors (length ± 1) are caught, distance-2 pairs are not") {
    // customer names share one length, so the real-table check above
    // only exercises substitutions; this frame pins all three edit
    // kinds plus a non-pair at distance 2.
    import spark.implicits._
    val dir = tmpDir("f20edge")
    Seq(
      (1L, "alpha"),   // vs 2: delete 'l' → distance 1
      (2L, "apha"),
      (3L, "alphas"),  // vs 1: insert 's' → distance 1
      (4L, "alpka"),   // vs 1: substitute 'h'→'k' → distance 1
      (5L, "alzka"),   // vs 4 distance 1; vs 1 distance 2 (must NOT pair)
      (6L, "omega")    // isolated
    ).toDF("c_custkey", "c_name").write.parquet(s"$dir/customer.parquet")
    val got = f20(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)))
  }
}
