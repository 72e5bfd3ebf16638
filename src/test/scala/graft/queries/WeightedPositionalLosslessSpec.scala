package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r10 self-review counterexample that proved the (removed)
  * PPJoin+-style suffix bound lossy on positionally-pruned match rows:
  * a qualifying pair whose second common shingle sits in A's weighted
  * prefix but FAILS the positional row filter on B's side. The prefix +
  * positional combination must keep the pair (its first common shingle
  * survives both filters); the suffix bound computed over the pruned
  * rows undercounted wprefix (5 instead of 9) and dropped it.
  *
  * Corpus (t = 0.5, global ascending-weight-contribution order):
  *   A: g1 w=5, g2 w=4, a3 w=1      → W_a = 10, wrem 10 / 5 / 1
  *   B: g1 w=5, b2 w=4.1, g2 w=4, b1 w=2.9 → W_b = 16, wrem 16 / 11 / 6.9 / 2.9
  * wc = w(g1) + w(g2) = 9, wj = 9 / (10 + 16 − 9) ≈ 0.529 ≥ 0.5 —
  * qualifying. g2's match row has min(wrem_a, wrem_b) = min(5, 6.9) <
  * t·max(W) = 8 → positionally pruned; only g1's row may carry the pair.
  */
class WeightedPositionalLosslessSpec extends SparkSpec {

  test("a qualifying pair survives when its non-first common shingle fails the positional filter") {
    import spark.implicits._
    // (doc_id, lang, shingle, nsalt, df, n, w, wrem, wsum)
    val postings = Seq(
      (1L, "en", "g1", 1, 2L, 3L, 5.0, 10.0, 10.0),
      (1L, "en", "g2", 1, 2L, 3L, 4.0, 5.0, 10.0),
      (1L, "en", "a3", 1, 1L, 3L, 1.0, 1.0, 10.0),
      (2L, "en", "g1", 1, 2L, 4L, 5.0, 16.0, 16.0),
      (2L, "en", "b2", 1, 1L, 4L, 4.1, 11.0, 16.0),
      (2L, "en", "g2", 1, 2L, 4L, 4.0, 6.9, 16.0),
      (2L, "en", "b1", 1, 1L, 4L, 2.9, 2.9, 16.0)
    ).toDF("doc_id", "lang", "shingle", "nsalt", "df", "n", "w", "wrem", "wsum")

    val out = DedupQueries.weightedJaccardPairs(postings, 0.5).collect()
    spark.catalog.clearCache()
    assert(out.length == 1, s"expected exactly the (1,2) pair, got ${out.length} rows")
    val r = out(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("common") == 2L, s"common = ${r.getAs[Long]("common")}")
    assert(math.abs(r.getAs[Double]("wc") - 9.0) < 1e-9, s"wc = ${r.getAs[Double]("wc")}")
    val wj = r.getAs[Double]("wc") /
      (r.getAs[Double]("w_a") + r.getAs[Double]("w_b") - r.getAs[Double]("wc"))
    info(f"pair (1,2): wc=${r.getAs[Double]("wc")}%.1f wj=$wj%.4f")
    assert(wj >= 0.5, f"pair qualifies at t=0.5 but scored $wj%.4f")
  }

  test("a non-qualifying pair with no prefix-surviving common shingle stays out") {
    import spark.implicits._
    // C and D share only a LOW-weight shingle deep in both suffixes:
    // wrem at the common row is far below t·max(W) on both sides, so
    // the positional filter (and the prefix filter before it) must
    // drop the pair — wj = 1 / (10 + 12 − 1) ≈ 0.048.
    val postings = Seq(
      (3L, "en", "c1", 1, 1L, 2L, 9.0, 10.0, 10.0),
      (3L, "en", "s1", 1, 2L, 2L, 1.0, 1.0, 10.0),
      (4L, "en", "d1", 1, 1L, 2L, 11.0, 12.0, 12.0),
      (4L, "en", "s1", 1, 2L, 2L, 1.0, 1.0, 12.0)
    ).toDF("doc_id", "lang", "shingle", "nsalt", "df", "n", "w", "wrem", "wsum")
    val out = DedupQueries.weightedJaccardPairs(postings, 0.5).collect()
    spark.catalog.clearCache()
    assert(out.isEmpty, s"non-qualifying pair leaked: ${out.mkString}")
  }
}
