package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins the skew-mitigation contract of x4's inverted-index join: the
  * per-key salt fan-out (nsalt = ceil(df / saltChunk)) changes the plan
  * — how a hot posting list's df² pair-chunks spread over reducers —
  * but NEVER the answer. A tiny chunk forces real fan-out on nearly
  * every key; the result must be bit-identical to the default chunk
  * (where this corpus's keys all get nsalt = 1).
  */
class DedupSaltSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def shingled = graft.corpus.Corpus
    .withShingles(Tables.documents(spark, dir))
    .select(col("doc_id"), col("lang"), col("sh"), size(col("sh")).as("n"))

  test("per-key salting is output-invariant: tiny chunk == default chunk") {
    def pairCounts(chunk: Long): Set[(Long, Long, Long)] = {
      val got = DedupQueries.ngramJaccardCommon(shingled, chunk).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.clearCache()
      got
    }
    // chunk=2 ⇒ every key with df > 2 joins under nsalt ≥ 2 — the hot
    // path that never engages at this corpus's df under the default
    val salted = pairCounts(2L)
    val default = pairCounts(1024L)
    assert(salted == default)
    assert(salted.nonEmpty)
  }

  test("weighted mode is salt-invariant too: wc/W carry through the fan-out unchanged") {
    // x28's weighted aggregates ride the same salted join — the weight
    // and wsum columns must survive the a-side/b-side split exactly
    // like the counts do (each common shingle's weight summed once).
    def weightedPairs(chunk: Long): Set[(Long, Long, Double, Double, Double)] = {
      val got = DedupQueries
        .ngramJaccardCommon(shingled, chunk, lengthFilter = false,
          idfWeighted = true)
        .select("doc_a", "doc_b", "wc", "w_a", "w_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
      spark.catalog.clearCache()
      got
    }
    val salted = weightedPairs(2L)
    val default = weightedPairs(1024L)
    assert(salted.map(t => (t._1, t._2)) == default.map(t => (t._1, t._2)))
    // wc is a double SUM whose addend order legitimately differs under
    // re-chunking; compare on a 1e-9 grid rather than bitwise
    val dMap = default.map(t => (t._1, t._2) -> t).toMap
    salted.foreach { t =>
      val d = dMap((t._1, t._2))
      assert(math.abs(t._3 - d._3) < 1e-9 &&
        math.abs(t._4 - d._4) < 1e-9 && math.abs(t._5 - d._5) < 1e-9,
        s"weighted aggregates drifted under salting: $t vs $d")
    }
  }

  test("salting bounds the per-(key, salt) posting volume (chunk=8)") {
    // the balance property behind the fan-out: after salting, no join
    // key carries more than ~chunk postings on the keyed side, so no
    // reducer can receive a df² pair block. (Same nsalt/salt formula as
    // ngramJaccardCommon; pmod spread isn't perfectly uniform → 3× slack.)
    val chunk = 8L
    val postings = shingled.select(col("doc_id"), col("lang"),
      explode(col("sh")).as("shingle"))
    val dfc = postings.groupBy("lang", "shingle").agg(count(lit(1)).as("df"))
    val maxPer = postings.join(dfc, Seq("lang", "shingle"))
      .withColumn("nsalt",
        least(ceil(col("df") / lit(chunk.toDouble)), lit(256L)).cast("int"))
      .withColumn("salt", pmod(col("doc_id"), col("nsalt")))
      .groupBy("lang", "shingle", "salt").count()
      .agg(max("count")).first().getLong(0)
    assert(maxPer <= 3 * chunk,
      s"hot key not spread: max per-(key, salt) posting volume $maxPer")
  }

  test("an artificially hot shingle cannot overload one reducer: measured task balance under boilerplate") {
    // The 100× -data claim behind x4's salting, proven on a measured run
    // instead of asserted in a comment: 512 docs share one boilerplate
    // bigram (df = 512 — the pathological posting list), so the pair
    // stage must emit ~131k pairs for ONE join key. Unsalted, one
    // reducer task writes all of them; salted (chunk=8 ⇒ nsalt=64 on
    // the hot key), the volume spreads across (key, salt) buckets. A
    // SparkListener records per-task shuffle WRITE records; the
    // heaviest stage (the pair join) must stay within ~2× of its mean
    // task volume when salted, while the unsalted run shows the
    // pile-up the fan-out exists to prevent. AQE and auto-broadcast
    // are pinned off so the join really shuffles on the key and
    // partitions aren't coalesced away under test-sized data.
    import spark.implicits._
    val hotDocs = (0 until 512)
      .map(i => (i.toLong, s"common boilerplate u$i v$i")).toDF("doc_id", "text")
    val shingled = graft.corpus.Corpus.withShingles(hotDocs)
      .select(col("doc_id"), lit("en").as("lang"), col("sh"),
        size(col("sh")).as("n"))

    def pairStageImbalance(chunk: Long): Double = {
      val stageWrites = new scala.collection.concurrent.TrieMap[
        Int, scala.collection.mutable.ArrayBuffer[Long]]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            stageWrites.getOrElseUpdate(te.stageId,
              scala.collection.mutable.ArrayBuffer.empty[Long]) +=
              m.shuffleWriteMetrics.recordsWritten
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        DedupQueries.ngramJaccardCommon(shingled, chunk).count()
        // listener delivery is async — wait until totals go stable
        val deadline = System.nanoTime() + 15000000000L
        var prev = -1L
        var stable = 0
        while (System.nanoTime() < deadline && stable < 3) {
          Thread.sleep(150)
          val cur = stageWrites.values.map(_.sum).sum
          if (cur == prev && cur > 0) stable += 1 else { stable = 0; prev = cur }
        }
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.catalog.clearCache()
      }
      val writes = stageWrites.values.maxBy(_.sum)
      writes.max / (writes.sum.toDouble / writes.size)
    }

    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = pairStageImbalance(8L)
      val unsalted = pairStageImbalance(1L << 40)
      info(f"pair-stage max/mean task shuffle-write records: salted $salted%.2f, unsalted $unsalted%.2f")
      assert(salted <= 2.0,
        f"salted pair stage still skewed: max/mean $salted%.2f")
      assert(unsalted > salted,
        f"unsalted run shows no pile-up ($unsalted%.2f vs $salted%.2f) — the scenario stopped exercising the hazard")
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("containment prefix path is salt-invariant and complete vs the unpruned join") {
    // x20's engine: prefix-filtered candidates + exact set verify. Two
    // contracts at once — (1) the salted build side never changes the
    // answer, (2) the prefix filter is LOSSLESS: every pair the
    // unpruned Σdf² inverted-index join scores ≥ t survives.
    def pairs(chunk: Long): Set[(Long, Long, Long)] = {
      val got = DedupQueries.containmentPairs(shingled, 0.4, chunk)
        .select("doc_a", "doc_b", "common").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.clearCache()
      got
    }
    val salted = pairs(2L)
    val default = pairs(1024L)
    assert(salted == default)
    assert(salted.nonEmpty)
    // ground truth from the unpruned engine (the pre-prefix x20 shape)
    import graft.functions.MoneyFunctions.roundAt
    val full = DedupQueries.ngramJaccardCommon(shingled, lengthFilter = false)
      .withColumn("cont", greatest(
        roundAt(col("common").cast("double") / col("n_a"), 6),
        roundAt(col("common").cast("double") / col("n_b"), 6)))
      .filter(col("cont") >= 0.4)
      .select("doc_a", "doc_b", "common").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    assert(default == full,
      s"prefix filter dropped/added pairs: only-prefix=${default -- full}, only-full=${full -- default}")
  }

  test("jaccard prefix path (x4's r7 engine) is salt-invariant and lossless vs the unpruned join") {
    // Same two contracts as x20's pin, for the jaccard instantiation —
    // which additionally prunes on size ratio (max ≤ min/t) inside the
    // candidate join. t = 0.3 (not x4's 0.5) so near-miss pairs exist on
    // the tiny corpus and the equality is non-vacuous.
    import graft.functions.MoneyFunctions.roundAt
    def pairs(chunk: Long): Set[(Long, Long, Double)] = {
      val got = DedupQueries.ngramJaccardPairsPrefix(shingled, 0.3, chunk)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      spark.catalog.clearCache()
      got
    }
    val salted = pairs(2L)
    val default = pairs(1024L)
    assert(salted == default)
    assert(salted.nonEmpty)
    // ground truth: the count-everything inverted index (x4's pre-r7
    // engine, no length filter so the prune under test can't hide in it)
    val full = DedupQueries.ngramJaccardCommon(shingled, lengthFilter = false)
      .withColumn("jaccard", roundAt(col("common").cast("double")
        / (col("n_a") + col("n_b") - col("common")), 6))
      .filter(col("jaccard") >= 0.3)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    assert(default == full,
      s"jaccard prefix path dropped/added pairs: only-prefix=${default -- full}, only-full=${full -- default}")
  }

  test("prefix filter shrinks the candidate volume vs the unpruned pair join") {
    // the scale claim behind x20's rewrite, measured: distinct candidate
    // pairs probed by the prefix filter vs distinct co-occurring pairs
    // in the unpruned inverted-index join (every one of which the old
    // engine aggregated and scored).
    val candidates = DedupQueries.containmentCandidates(shingled, 0.4).count()
    spark.catalog.clearCache()
    val unpruned = DedupQueries.ngramJaccardCommon(shingled, lengthFilter = false)
      .count()
    spark.catalog.clearCache()
    info(s"candidate pairs: prefix-filtered $candidates vs unpruned $unpruned " +
      f"(${100.0 * candidates / unpruned}%.1f%%)")
    assert(candidates < unpruned,
      s"prefix filter reduced nothing: $candidates vs $unpruned")
  }

  test("positional filter is lossless: candidate pairs with it are a subset, surviving verified pairs identical") {
    // PPJoin's positional filter (containmentCandidatesFrom posFilter):
    // the bound 1 + min(n2−rn) at a prefix match can only DROP candidate
    // rows, and never a row of a qualifying pair (the first common
    // shingle's row always clears the bound) — so candidates shrink or
    // stay equal while the verified output is bit-identical.
    def cands(pos: Boolean): Set[(Long, Long)] = {
      val got = DedupQueries.containmentCandidatesFrom(
          DedupQueries.indexedPostings(shingled), 0.4, posFilter = pos)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      got
    }
    val on = cands(pos = true)
    val off = cands(pos = false)
    assert(on.subsetOf(off), s"positional filter ADDED pairs: ${on -- off}")
    def verified(pos: Boolean): Set[(Long, Long)] = {
      val got = DedupQueries.containmentVerify(
          DedupQueries.containmentCandidatesFrom(
            DedupQueries.indexedPostings(shingled), 0.4, posFilter = pos),
          shingled.select(col("doc_id"), col("sh"), col("n")), 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      got
    }
    assert(verified(pos = true) == verified(pos = false))
    info(s"candidates with filter ${on.size} vs without ${off.size}")
  }

  test("weighted prefix path (x28's r10 engine) is salt-invariant and lossless vs the count-everything index") {
    // The weighted generalization of the two x4/x20 contracts: (1) the
    // salted build never changes the answer, (2) the WEIGHTED prefix
    // filter (wrem ≥ t·wsum down-set, Bayardo WWW'07 §3) plus the
    // weighted positional filter is LOSSLESS — every pair the unpruned
    // Σdf² weighted join scores ≥ t survives, with identical wc/common.
    // t = 0.15 (below x28's 0.3) so near-threshold pairs exist on the
    // tiny corpus and the equality is non-vacuous.
    import graft.functions.MoneyFunctions.roundAt
    val t = 0.15
    def pairs(chunk: Long): Set[(Long, Long, Long, Double)] = {
      val got = DedupQueries.weightedJaccardPairs(
          DedupQueries.indexedPostings(shingled, chunk), t)
        .withColumn("wj", roundAt(
          col("wc") / (col("w_a") + col("w_b") - col("wc")), 6))
        .filter(col("wj") >= t)
        .select("doc_a", "doc_b", "common", "wj").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      spark.catalog.clearCache()
      got
    }
    val salted = pairs(2L)
    val default = pairs(1024L)
    assert(salted == default)
    assert(salted.nonEmpty)
    // ground truth: the count-everything weighted inverted index (x28's
    // pre-r10 engine)
    val full = DedupQueries.ngramJaccardCommon(shingled,
        lengthFilter = false, idfWeighted = true)
      .withColumn("wj", roundAt(
        col("wc") / (col("w_a") + col("w_b") - col("wc")), 6))
      .filter(col("wj") >= t)
      .select("doc_a", "doc_b", "common", "wj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    spark.catalog.clearCache()
    assert(default == full,
      s"weighted prefix path dropped/added pairs: only-prefix=${default -- full}, only-full=${full -- default}")
  }

  test("weighted prefix filter shrinks the candidate volume vs the unpruned weighted join") {
    // the scale claim behind x28's r10 rewrite, measured twice over:
    // (1) probe JOIN volume — Σ df over probe postings vs over the full
    // df ≥ 2 index (each posting meets ~df partners, so this is the
    // pair-row volume the join actually emits; the {wrem ≥ t·wsum}
    // down-set under ascending-df order keeps the LARGEST weights,
    // which sit on the SMALLEST posting lists, so the volume ratio
    // beats the row ratio); (2) distinct candidate pairs vs the
    // distinct co-occurring pairs the count-everything engine
    // aggregated and scored.
    val t = 0.3
    val idx = DedupQueries.indexedPostings(shingled).filter(col("df") >= 2)
      .cache()
    val volAll = idx.agg(sum("df")).first().getLong(0)
    val probe = idx.filter(col("wrem") >= lit(t - 1e-6 - 1e-9) * col("wsum"))
    val volProbe = probe.agg(sum("df")).first().getLong(0)
    val nAll = idx.count()
    val nProbe = probe.count()
    val candidates = DedupQueries.weightedJaccardPairs(
        DedupQueries.indexedPostings(shingled), t)
      .count()
    spark.catalog.clearCache()
    val unpruned = DedupQueries.ngramJaccardCommon(shingled,
      lengthFilter = false, idfWeighted = true).count()
    spark.catalog.clearCache()
    info(f"probe postings $nProbe/$nAll rows (${100.0 * nProbe / nAll}%.1f%%), " +
      f"join volume Σdf $volProbe/$volAll (${100.0 * volProbe / volAll}%.1f%%), " +
      f"verified pairs $candidates vs unpruned co-occurring $unpruned " +
      f"(${100.0 * candidates / unpruned}%.1f%%)")
    assert(volProbe < volAll, s"probe volume not reduced: $volProbe vs $volAll")
    assert(candidates < unpruned,
      s"weighted prefix reduced nothing: $candidates vs $unpruned")
  }

  test("the tiny chunk really engages the fan-out (corpus has df > 2 keys)") {
    val maxDf = shingled
      .select(col("lang"), explode(col("sh")).as("shingle"))
      .groupBy("lang", "shingle").count()
      .agg(max("count")).first().getLong(0)
    assert(maxDf > 2, s"corpus too small to exercise salting (max df $maxDf)")
  }
}
