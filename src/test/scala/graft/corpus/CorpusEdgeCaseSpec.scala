package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pathological-input robustness for the corpus library: empty strings,
  * single words, exact clones, and an outsized document must flow
  * through shingling, LSH dedup, clustering, quality signals, and
  * curate() without exceptions and with sane outputs — these are the
  * first rows a real ingest feed contains.
  */
class CorpusEdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def weird = Seq(
    (0L, ""),                                   // empty text
    (1L, "word"),                               // single word — no shingles
    (2L, "two words"),                          // minimal shingle
    (3L, "two words"),                          // exact clone of 2
    (4L, ("tok " * 5000).trim),                 // outsized, fully repetitive
    (5L, "1 2 3 4 5 6 7 8 9"),                  // all-numeric words
    (6L, "alpha beta gamma delta eps zeta eta") // normal doc
  ).toDF("doc_id", "text")

  test("shingling and near-dup pairs survive degenerate docs") {
    val sh = Corpus.withShingles(weird).select("doc_id", "sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(0L).isEmpty && sh(1L).isEmpty)      // <2 words → no shingles
    assert(sh(2L) == Seq("two words"))
    assert(sh(4L) == Seq("tok tok"))              // distinct collapses repeats
    val pairs = Corpus.nearDupPairs(weird).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the exact clone pair is found at jaccard 1.0; shingle-less docs
    // can never pair (null band keys fall out of the equi-join)
    assert(pairs.contains((2L, 3L, 1.0)))
    assert(!pairs.exists(p => p._1 <= 1 || p._2 <= 1))
    spark.catalog.clearCache()
  }

  test("curate with the quality gate handles degenerate docs end to end") {
    val curated = Corpus.curate(weird, qualityGate = true)
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // gate: doc 0 (0 words), 1/2/3 (<5 words), 4 (dup fraction 1.0),
    // 5 (all symbol words) all fail; only doc 6 survives
    assert(curated.keySet == Set(6L))
    assert(curated(6L) == 6L)
    // without the gate everything flows through and the clone collapses
    val all = Corpus.curate(weird)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(0L, 1L, 2L, 4L, 5L, 6L)) // 3 deduped into 2's cluster
    spark.catalog.clearCache()
  }

  test("quality signals are well-defined on empty and numeric docs") {
    val q = Corpus.qualitySignals(weird)
      .select("doc_id", "n_words", "dup_word_fraction",
        "numeric_char_fraction", "symbol_word_fraction", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(q(0L)._1 == 1L)                 // split("") → [""] — one token
    assert(q(5L)._4 == 1.0 && !q(5L)._5)   // all-numeric words → symbol words, dropped
    assert(q(4L)._2 > 0.99 && !q(4L)._5)   // fully repetitive → dropped
    assert(q(6L)._5)                       // normal doc kept
  }
}
