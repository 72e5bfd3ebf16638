package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.core.Tables

/** Quantifies what the probabilistic dedup/classification paths trade
  * for speed — the lexical twin of AnnRecallSpec: LSH dedup
  * recall/precision against the exact ≥0.5-jaccard pair set, and the
  * marker-langid accuracy from its own confusion matrix. The numbers go
  * on the test-log record so the trade-off is explicit, with floors
  * that catch a silent collapse.
  */
class DedupRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("LSH dedup recall vs the exact jaccard pair set is on the record; precision is exactly 1") {
    val sh = graft.corpus.Corpus.withShingles(Tables.documents(spark, dir))
      .select("doc_id", "sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    spark.catalog.clearCache()
    val ids = sh.keys.toSeq.sorted
    // exact truth, driver-side (500 docs → 125k pairs): same distinct
    // bigram shingles, same 6dp rounding before the threshold
    val exact = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.size).iterator
      a = ids(i); b = ids(j)
      sa = sh(a); sb = sh(b)
      if sa.nonEmpty && sb.nonEmpty
      inter = sa.intersect(sb).size
      if round6(inter.toDouble / (sa.size + sb.size - inter)) >= 0.5
    } yield (a, b)).toSet
    val lsh = SparkEntry.queries("x2_dedup_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(exact.nonEmpty, "no exact near-dup pairs — spec is vacuous")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    info(f"LSH dedup (H=16, 8×2 bands) vs exact ≥0.5 pairs: " +
      f"recall=$recall%.3f over ${exact.size} true pairs, ${lsh.size} found")
    println(f"LSH DEDUP RECALL: $recall%.3f (${lsh.size}/${exact.size})")
    // the verify stage computes the exact jaccard on every candidate, so
    // anything emitted IS a true pair — precision 1.0 by construction
    assert(lsh.subsetOf(exact),
      s"LSH emitted non-pairs: ${(lsh -- exact).take(3)}")
    // 8 bands × 2 rows: P(candidate) = 1 − (1 − j²)^8 ≥ 0.90 at j = 0.5
    // and → 1 fast above it; the floor catches a banding regression
    assert(recall >= 0.8, f"LSH recall collapsed: $recall%.3f")
  }

  test("x32 ground-truth sampling is lossless: sampled exact pairs = full exact pairs restricted to the sample") {
    // the r8 sample gate bounds the one super-linear computation in the
    // battery; this pins that the gate COMMUTES with the pair
    // computation (sampling docs then finding pairs ≡ finding pairs
    // then keeping those with both endpoints sampled), so the sampled
    // recall is a true recall over the sampled subgraph — and keeps the
    // UNSAMPLED run alive at small sf as the lossless reference.
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, "/root/testdata/sf0.01")
    def pairsOf(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val sh = graft.corpus.Corpus.withShingles(docs)
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n"),
          lit("all").as("lang"))
      val out = DedupQueries.ngramJaccardPairsPrefix(sh, 0.5)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      out
    }
    val pct = DedupQueries.x32SamplePct
    val sampledIds = graft.corpus.Corpus.withBucket(base)
      .filter(col("bucket") < pct).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(sampledIds.nonEmpty && sampledIds.size < 500,
      s"sample gate degenerate: ${sampledIds.size}/500 docs")
    val full = pairsOf(base)
    val sampled = pairsOf(graft.corpus.Corpus.withBucket(base)
      .filter(col("bucket") < pct).drop("bucket"))
    val expected = full.filter { case (a, b) =>
      sampledIds.contains(a) && sampledIds.contains(b) }
    assert(sampled == expected,
      s"gate is not lossless: sampled-only=${(sampled -- expected).take(3)} " +
        s"missing=${(expected -- sampled).take(3)}")
    info(s"x32 gate at $pct%: ${sampledIds.size}/500 docs, " +
      s"${expected.size}/${full.size} exact pairs retained")
    // and the query's own report agrees with the independently-derived
    // sampled pair count
    val row = DedupQueries.lshRecallReport(spark, "/root/testdata/sf0.01", pct)
      .collect().head
    assert(row.getLong(0) == expected.size.toLong,
      s"x32 n_exact ${row.getLong(0)} != ${expected.size}")
    spark.catalog.clearCache()
  }

  test("marker-langid accuracy from the t1 confusion matrix is on the record") {
    val rows = SparkEntry.queries("t1_langid_markers")(spark, dir).collect()
    val total = rows.map(_.getLong(2)).sum
    val correct = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val acc = correct.toDouble / total
    info(f"marker langid accuracy vs labeled lang: $acc%.3f over $total docs " +
      "(≈ chance: the synthetic generator draws every lang's text from a " +
      "shared vocabulary, so there is no lexical signal to find — the " +
      "oracle pins the MECHANISM; this records what the data admits)")
    println(f"LANGID ACCURACY: $acc%.3f (synthetic corpus ≈ chance)")
    assert(total > 0)
    // sanity floor just below uniform-chance over the 5 labels: a broken
    // argmax/tiebreak that systematically anti-correlates would dip under
    assert(acc >= 0.15, f"langid below chance — argmax broken: $acc%.3f")
  }
}
