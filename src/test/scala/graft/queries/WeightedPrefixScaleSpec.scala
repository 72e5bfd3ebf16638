package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The corpus-regime contract behind x28's r10 adaptive dispatch
  * (DedupQueries.weightedJaccardAdaptive), demonstrated on the regime
  * the r9 verdict named as the 100 TB failure mode: a boilerplate-heavy
  * corpus, where every doc shares a hot template and only rare phrasing
  * distinguishes near-dups.
  *
  * On such a corpus the count-everything weighted index pays Σ df² on
  * the template shingles (df = N ⇒ N² pair rows per template shingle —
  * the measured 390×-shuffle-growth shape), while the weighted prefix
  * filter's probe volume collapses: template shingles carry near-zero
  * idf weight (w = N/df = 1), sort to the END of the ascending-df
  * order, and fall out of every probe prefix — probing rides the few
  * RARE shingles whose posting lists are short. The spec pins (1) the
  * dispatch statistic lands on the prefix engine here and on the
  * count-everything engine for the flat-df testdata corpus, (2) the
  * two engines agree exactly, (3) the measured join-volume gap is the
  * orders-of-magnitude the dispatch exists to capture.
  */
class WeightedPrefixScaleSpec extends SparkSpec {

  private val nDocs = 600
  private val t = 0.3

  /** `n` docs = n/2 near-dup pairs: 20 shared template words (19 hot
    * bigrams, df = n), 5 pair-private rare words (5 df = 2 bigrams
    * incl. the template→rare bridge), 1 doc-private tail word (1 df = 1
    * bigram). Within a pair the docs differ only in the tail —
    * wj ≈ 0.56 ≥ t; across pairs only the template is shared —
    * wj ≈ 0.005 < t. `idOffset` moves the ids clear of a real corpus's
    * id space for the mixed-regime fixtures.
    */
  private def boilerplateDocsN(n: Int, idOffset: Long = 0L) = {
    import spark.implicits._
    val template = (1 to 20).map(i => s"tpl$i").mkString(" ")
    (0 until n).map { i =>
      val pair = i / 2
      val rare = (1 to 5).map(k => s"rare${pair}_$k").mkString(" ")
      (idOffset + i, s"$template $rare tail$i")
    }.toDF("doc_id", "text")
  }

  private def boilerplateDocs = boilerplateDocsN(nDocs)

  private def shingledBoiler = graft.corpus.Corpus
    .withShingles(boilerplateDocs)
    .select(col("doc_id"), lit("en").as("lang"), col("sh"),
      size(col("sh")).as("n"))

  test("dispatch statistic: prefix engine on boilerplate, count-everything on flat-df testdata") {
    val slack = lit(t - 1e-6 - 1e-9)
    def fraction(idx: org.apache.spark.sql.DataFrame): Double = {
      val r = idx.filter(col("df") >= 2)
        .agg(sum("df").as("vol"),
          sum(when(col("wrem") >= slack * col("wsum"), col("df"))).as("probe"))
        .first()
      r.getLong(1).toDouble / r.getLong(0)
    }
    val boiler = fraction(DedupQueries.indexedPostings(shingledBoiler))
    val flat = fraction(DedupQueries.indexedPostings(
      graft.corpus.Corpus
        .withShingles(graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))
        .select(col("doc_id"), col("lang"), col("sh"), size(col("sh")).as("n"))))
    info(f"probe-volume fraction: boilerplate $boiler%.4f, flat-df testdata $flat%.3f")
    // 0.08 = the r12 bracketed crossover (CrossoverSweep: count-
    // everything still 2.4× faster at 0.092, tie at 0.056)
    assert(boiler < 0.08, f"boilerplate corpus should dispatch to the prefix engine ($boiler%.4f)")
    assert(flat > 0.08, f"flat-df corpus should dispatch to count-everything ($flat%.3f)")
  }

  test("mid-regime fixture: the dispatch statistic lands between the measured extremes, engines output-equal") {
    // r11 verdict item 4: the 0.15 cutoff sat between measurements at
    // 0.62 (flat) and 0.0005 (boilerplate) with nothing in between.
    // This fixture UNIONS the flat corpus with a boilerplate block
    // whose template df² mass is sized — from the flat index's own
    // measured volumes — to drag the probe-volume fraction into the
    // mid band around the cutoff. The flat docs' per-doc prefix is
    // invariant under the union (w = N/df scales every shingle of a
    // doc by the same factor, so wrem/wsum is unchanged and the flat
    // probe volume carries over verbatim), which is what makes the
    // closed-form B sizing exact enough to land in-band. The
    // CrossoverSweep tool measures both engines' wall time across this
    // band; this spec pins the fixture's regime and the engines'
    // output equality so the timing table rests on verified ground.
    import graft.functions.MoneyFunctions.roundAt
    val slack = lit(t - 1e-6 - 1e-9)
    def volumes(idx: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = idx.filter(col("df") >= 2)
        .agg(sum("df").as("vol"),
          sum(when(col("wrem") >= slack * col("wsum"), col("df"))).as("probe"))
        .first()
      (r.getLong(0), r.getLong(1))
    }
    val flatDocs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def shingled(docs: org.apache.spark.sql.DataFrame) = graft.corpus.Corpus
      .withShingles(docs)
      .select(col("doc_id"), coalesce(col("lang"), lit("en")).as("lang"),
        col("sh"), size(col("sh")).as("n"))
    val (volF, probeF) = volumes(DedupQueries.indexedPostings(shingled(flatDocs)))
    // 19 template bigrams at df=B contribute ~19·B² posting volume and
    // ~nothing to the probe: fraction ≈ probeF / (volF + 19·B²) = 0.15
    val bRaw = math.sqrt(math.max(1.0, probeF / 0.15 - volF) / 19.0)
    val b = (math.ceil(bRaw / 2).toInt * 2).max(4)
    val mixed = shingled(flatDocs.select("doc_id", "lang", "text")
      .unionByName(boilerplateDocsN(b, idOffset = 10000000L)
        .withColumn("lang", lit("en"))
        .select("doc_id", "lang", "text")))
    val idx = DedupQueries.indexedPostings(mixed).cache()
    val (volM, probeM) = volumes(idx)
    val frac = probeM.toDouble / volM
    info(f"flat vol=$volF probe=$probeF; B=$b; mid fraction=$frac%.4f")
    assert(frac > 0.05 && frac < 0.35,
      f"mid fixture missed the band: $frac%.4f (B=$b)")
    def result(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("wj", roundAt(
        col("wc") / (col("w_a") + col("w_b") - col("wc")), 6))
      .filter(col("wj") >= t)
      .select("doc_a", "doc_b", "common", "wj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val prefix = result(DedupQueries.weightedJaccardPairs(idx, t))
    val full = result(DedupQueries.ngramJaccardCommonFrom(
      mixed, idx, lengthFilter = false, idfWeighted = true,
      weightsOnIndex = true))
    spark.catalog.clearCache()
    assert(prefix == full,
      s"engines disagree mid-regime: only-prefix=${(prefix -- full).take(3)}, " +
        s"only-full=${(full -- prefix).take(3)}")
    // the boilerplate pairs are found by both engines through the union
    assert(prefix.count(_._1 >= 10000000L) == b / 2)
  }

  test("both engines agree exactly on the boilerplate corpus") {
    import graft.functions.MoneyFunctions.roundAt
    def result(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] = {
      val got = df
        .withColumn("wj", roundAt(
          col("wc") / (col("w_a") + col("w_b") - col("wc")), 6))
        .filter(col("wj") >= t)
        .select("doc_a", "doc_b", "common", "wj").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      spark.catalog.clearCache()
      got
    }
    val sh = shingledBoiler
    val prefix = result(DedupQueries.weightedJaccardPairs(
      DedupQueries.indexedPostings(sh), t))
    val full = result(DedupQueries.ngramJaccardCommon(sh,
      lengthFilter = false, idfWeighted = true))
    assert(prefix == full,
      s"engines disagree: only-prefix=${prefix -- full}, only-full=${full -- prefix}")
    // every one of the 300 constructed near-dup pairs, nothing else
    assert(prefix.size == nDocs / 2)
    assert(prefix.forall { case (a, b, _, wj) => b == a + 1 && wj > 0.5 })
  }

  test("the join-volume gap the dispatch captures is orders of magnitude") {
    // count-everything pair-row volume = Σ_postings df (each posting
    // meets df − 1 partners); prefix probe volume = Σ_probe df. On the
    // template corpus the former is dominated by 19 df=600 shingles ×
    // 600 docs — the df² explosion — while probing rides only each
    // doc's 3-posting rare prefix.
    val slack = lit(t - 1e-6 - 1e-9)
    val idx = DedupQueries.indexedPostings(shingledBoiler)
      .filter(col("df") >= 2).cache()
    val volAll = idx.agg(sum("df")).first().getLong(0)
    val volProbe = idx.filter(col("wrem") >= slack * col("wsum"))
      .agg(sum("df")).first().getLong(0)
    spark.catalog.clearCache()
    info(f"pair-row volume: count-everything $volAll, prefix probe $volProbe (${volAll / volProbe.toDouble}%.0f×)")
    assert(volAll > 100L * volProbe,
      s"volume gap collapsed: $volAll vs $volProbe")
  }
}
