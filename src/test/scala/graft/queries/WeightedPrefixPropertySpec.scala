package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized losslessness for x28's weighted prefix engine. The r10
  * self-review found a lossy suffix bound that every FIXTURE test had
  * passed — the fixtures simply never produced the weight profile that
  * broke it. This spec closes that class of gap: seeded random corpora
  * (zipf-ish vocab — heavy boilerplate head, rare discriminative tail —
  * plus near-dup clones) at random thresholds, with the prefix engine's
  * output pinned set-equal to the count-everything index on every
  * trial. Deterministic seed, so a failure is reproducible; any
  * divergence prints the offending pairs and the trial's (seed, t).
  */
class WeightedPrefixPropertySpec extends SparkSpec {

  test("weighted prefix engine == count-everything on seeded random corpora and thresholds") {
    import spark.implicits._
    import graft.functions.MoneyFunctions.roundAt
    val rnd = new scala.util.Random(0x5eedL)
    var pairsSeen = 0L
    for (trial <- 1 to 6) {
      val common = (1 to 4).map(i => s"c$i")
      val mid = (1 to 15).map(i => s"m$i")
      val rare = (1 to 150).map(i => s"r$i")
      def word(): String = {
        val p = rnd.nextDouble()
        if (p < 0.55) common(rnd.nextInt(common.size))
        else if (p < 0.8) mid(rnd.nextInt(mid.size))
        else rare(rnd.nextInt(rare.size))
      }
      val nDocs = 25 + rnd.nextInt(20)
      val base = (0 until nDocs).map { i =>
        val len = 4 + rnd.nextInt(18)
        (i.toLong, (1 to len).map(_ => word()).mkString(" "))
      }
      // near-dup clones: append a word, or duplicate verbatim
      val clones = base.take(nDocs / 3).map { case (id, t) =>
        (id + 1000L, if (rnd.nextBoolean()) t else t + " " + word())
      }
      val docs = (base ++ clones).toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
      val shingled = graft.corpus.Corpus.withShingles(docs)
        .select(col("doc_id"), col("lang"), col("sh"), size(col("sh")).as("n"))
        .cache()
      val t = math.floor((0.15 + rnd.nextDouble() * 0.55) * 100) / 100
      def norm(df0: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
        df0.withColumn("wj", roundAt(
            col("wc") / (col("w_a") + col("w_b") - col("wc")), 6))
          .filter(col("wj") >= t)
          .select("doc_a", "doc_b", "common", "wj").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      // saltChunk=2 keeps the fan-out path engaged on every trial
      val prefix = norm(DedupQueries.weightedJaccardPairs(
        DedupQueries.indexedPostings(shingled, 2L), t))
      spark.catalog.clearCache()
      val full = norm(DedupQueries.ngramJaccardCommon(shingled,
        lengthFilter = false, idfWeighted = true))
      spark.catalog.clearCache()
      assert(prefix == full,
        s"trial $trial (t=$t): only-prefix=${prefix -- full}, only-full=${full -- prefix}")
      info(s"trial $trial: t=$t docs=${nDocs + clones.size} pairs=${full.size}")
      pairsSeen += full.size
    }
    assert(pairsSeen > 0, "no trial produced a qualifying pair — property is vacuous")
  }
}
