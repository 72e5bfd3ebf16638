package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.core.Tables
import graft.multimodal.Multimodal

/** m5_frame_recall_report — the frame-hash path's recall telemetry
  * (x32's twin, r14 verdict item 1). Two pins:
  *
  *  1. the WHOLE report (both pair pipelines, the corpus-scope df pass,
  *     the md5 sample gate, every output column) equals an independent
  *     driver-side twin computed with plain Scala collections — sampled
  *     at sf0.01 and unsampled at sf0.001, so both gate readings are
  *     covered and the truth side is proven ≡ uncapped where no hash
  *     approaches the truth bound;
  *  2. the cap's recall cost is MEASURABLE, not hypothetical: a
  *     replica-shared population one past the production cap drives the
  *     report's recall to exactly 0 while the truth bound keeps every
  *     pair — the number the r14 sf3 run showed growing with index
  *     size, now impossible to lose silently.
  */
class FrameRecallSpec extends SparkSpec {

  /** driver-side twin of [[EventQueries.frameRecallReport]]: frame-hash
    * sets via the same per-row kernel ([[Multimodal.frameHashSeq]]),
    * corpus df from a plain groupBy, the md5 bucket from
    * MessageDigest — nothing shared with the Spark plan past the hash
    * kernel itself.
    */
  private def twin(dir: String, samplePct: Int,
      bounded: Boolean = false): Report = {
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    spark.catalog.clearCache()
    val sets: Map[Long, Set[Long]] = docs.map { case (id, text) =>
      id -> Multimodal.frameHashSeq(
        Multimodal.MediaRow(id, text.getBytes("UTF-8"),
          Multimodal.MediaMeta("application/x-fake", 32, 2, 0L)),
        everyN = Multimodal.FRAME_EVERY_N).toSet
    }.toMap
    val df: Map[Long, Int] = sets.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.size }
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      (hex.foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16)) % 100).toInt
    }
    // frame-CARRYING media only: the report's keeper universe comes from
    // the (media_id, fhash48) frame, so a zero-frame doc (empty text)
    // never enters it
    val ids = sets.keys.toSeq
      .filter(id => sets(id).nonEmpty &&
        (samplePct >= 100 || bucket(id) < samplePct)).sorted
    def pairSetUnder(cap: Int): Set[(Long, Long)] = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.size).iterator
      a = ids(i); b = ids(j)
      shared = sets(a).intersect(sets(b)).count(h => df(h) <= cap)
      if shared >= 2
    } yield (a, b)).toSet
    // the production bounded rule, first-principles (r16 — one
    // rep-shared candidate hash where the LOWER id is among the hash's
    // cap lowest evidence holders, then full truth-capped set-intersect
    // ≥ 2; reps are corpus-scope, endpoints sample-gated)
    def boundedPairSet(): Set[(Long, Long)] = {
      val evSets: Map[Long, Set[Long]] = sets.map { case (id, s) =>
        id -> s.filter(h => df(h) <= Multimodal.FRAME_TRUTH_DF_CAP)
      }
      val reps: Map[Long, Set[Long]] = evSets.toSeq
        .flatMap { case (id, s) => s.map(_ -> id) }
        .groupBy(_._1).map { case (h, xs) =>
          h -> xs.map(_._2).sorted.take(Multimodal.FRAME_DF_CAP).toSet
        }
      (for {
        i <- ids.indices.iterator
        j <- (i + 1 until ids.size).iterator
        a = ids(i); b = ids(j)
        shared = evSets(a).intersect(evSets(b))
        if shared.exists(h => reps(h).contains(a)) && shared.size >= 2
      } yield (a, b)).toSet
    }
    val exact = pairSetUnder(Multimodal.FRAME_TRUTH_DF_CAP)
    val capped =
      if (bounded) boundedPairSet() else pairSetUnder(Multimodal.FRAME_DF_CAP)
    def keeper(pairs: Set[(Long, Long)]): Map[Long, Long] = {
      val nbrs = (pairs.toSeq.map(p => p._1 -> p._2) ++
        pairs.toSeq.map(p => p._2 -> p._1)).groupBy(_._1)
        .map { case (id, xs) => id -> xs.map(_._2).min }
      ids.map(id => id ->
        math.min(id, nbrs.getOrElse(id, id))).toMap
    }
    val (tk, ck) = (keeper(exact), keeper(capped))
    val nMedia = ids.size.toLong
    val nMatch = ids.count(id => tk(id) == ck(id)).toLong
    val nExact = exact.size.toLong
    val nCapped = capped.size.toLong
    val nEvicted = df.values.count(d =>
      d > Multimodal.FRAME_DF_CAP && d <= Multimodal.FRAME_TRUTH_DF_CAP).toLong
    val maxDf = if (df.isEmpty) 0L else df.values.max.toLong
    val recall = if (nExact == 0) 1.0 else nCapped.toDouble / nExact
    val agree = if (nMedia == 0) 1.0 else nMatch.toDouble / nMedia
    (nExact, nCapped, nExact - nCapped, recall, nEvicted, maxDf,
      nMedia, nMatch, agree)
  }

  private type Report = (Long, Long, Long, Double, Long, Long, Long, Long, Double)

  private def report(dir: String, pct: Int,
      bounded: Boolean = false): Report = {
    val r = EventQueries.frameRecallReport(spark, dir, pct, bounded)
      .collect().head
    spark.catalog.clearCache()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8))
  }

  test("m5 equals an independent driver-side twin, sampled and unsampled") {
    val sampled = report("/root/testdata/sf0.01", EventQueries.m5SamplePct)
    assert(sampled == twin("/root/testdata/sf0.01", EventQueries.m5SamplePct),
      s"sampled report diverged from the driver twin: $sampled")
    assert(sampled._1 > 0,
      "no truth pairs in the sampled fixture — the gate pin is vacuous")
    // unsampled at the smaller sf: pct=100 must read every doc, and with
    // max_df far under the truth bound the truth side IS the uncapped
    // pair set (the twin applies no cap that can fire)
    val full = report("/root/testdata/sf0.001", 100)
    assert(full == twin("/root/testdata/sf0.001", 100),
      s"unsampled report diverged from the driver twin: $full")
    assert(full._6 < Multimodal.FRAME_TRUTH_DF_CAP,
      "fixture outgrew the truth bound — the truth≡uncapped reading no longer holds")
  }

  test("m7's bounded rule equals the driver-side production-rule twin, sampled and unsampled") {
    // the r16 alignment pin: the telemetry's candidate+verify stages
    // are the production helpers, and BOTH equal a first-principles
    // driver-side twin of the loop's rule (one rep-shared candidate
    // hash + full set-intersect ≥ 2)
    val sampled = report("/root/testdata/sf0.01",
      EventQueries.m5SamplePct, bounded = true)
    assert(sampled == twin("/root/testdata/sf0.01",
        EventQueries.m5SamplePct, bounded = true),
      s"sampled bounded report diverged from the driver twin: $sampled")
    val full = report("/root/testdata/sf0.001", 100, bounded = true)
    assert(full == twin("/root/testdata/sf0.001", 100, bounded = true),
      s"unsampled bounded report diverged from the driver twin: $full")
  }

  test("the candidate stage is saltChunk-invariant (the DedupSaltSpec pin for m6)") {
    // saltChunk=1 maxes the per-hash fan-out (nsalt = min(df, 256));
    // every (rep, holder) co-occurrence must still match exactly once,
    // so the candidate pair set cannot move
    import graft.multimodal.Multimodal
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, "/root/testdata/sf0.01"), width = 32, height = 2)
    val fh = Multimodal.frameHashes(media, everyN = Multimodal.FRAME_EVERY_N)
      .select("media_id", "fhash48").distinct().cache()
    val dfm = Multimodal.frameDf(fh).cache()
    val ev = Multimodal.truthEvidence(fh, dfm, Multimodal.FRAME_TRUTH_DF_CAP)
      .cache()
    val rep = Multimodal.electReps(ev)
    def pairs(saltChunk: Long): Set[(Long, Long)] =
      Multimodal.repCandidatePairs(rep, ev, dfm, saltChunk).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs(1024L)
    assert(base.nonEmpty, "no candidates at sf0.01 — the pin is vacuous")
    assert(pairs(1L) == base,
      "candidate pairs moved under maximum salting — the salt scheme " +
        "double- or under-matches some co-occurrence")
    spark.catalog.clearCache()
  }

  test("a population one past the production cap zeroes recall while truth keeps every pair") {
    // 70 distinct media sharing two 64-byte blocks at sampled frame
    // offsets (chunks 0 and 2 under the 32×2 every-2nd geometry), each
    // with a unique sampled chunk 4. The shared hashes carry df=70 —
    // past FRAME_DF_CAP, under FRAME_TRUTH_DF_CAP — so every pair is a
    // truth pair and NO pair survives the capped side: two docs share
    // at most one df≤cap hash (their unique chunks, and only on an
    // aHash collision), below the ≥2 evidence rule.
    val n = Multimodal.FRAME_DF_CAP + 6
    val blockA = "A" * 64
    val blockB = ("b0" * 16) + ("c1" * 16)
    def unique(i: Int) = f"doc$i%03d-" + ("z" + f"$i%02d") * 19 // 64 chars
    val rows = (0 until n).map { i =>
      (900000L + i, blockA + ("x" * 64) + blockB + ("y" * 64) + unique(i).take(64),
        "en", "synthetic", 320L)
    }
    val dir = tmpDir("m5_evict")
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (nExact, nCapped, nMissed, recall, nEvicted, maxDf,
      nMedia, nMatch, agree) = report(dir, 100)
    val expectPairs = n.toLong * (n - 1) / 2
    assert(nExact == expectPairs,
      s"every replica pair must be a truth pair: got $nExact of $expectPairs")
    assert(nCapped == 0 && nMissed == expectPairs,
      s"the capped side must lose the whole population: capped=$nCapped")
    assert(recall == 0.0, s"recall must read 0, got $recall")
    assert(nEvicted >= 2, s"both shared hashes sit between the caps: $nEvicted")
    assert(maxDf == n.toLong,
      s"max_df must be the replica multiplicity $n, got $maxDf")
    // keeper agreement under the strict cap: only the global minimum
    // itself still elects the right keeper (itself) — 1 of n media
    assert(nMedia == n.toLong && nMatch == 1L,
      s"strict-cap keeper agreement must be 1/$n, got $nMatch/$nMedia")
    assert(agree == 1.0 / n)

    // the r15 remedy on the SAME fixture: representative-bounded
    // pairing keeps every pair with a representative endpoint — all but
    // the C(n-cap, 2) pairs among the non-representative tail — and
    // every media's keeper is still the global minimum id, because the
    // minimum is a representative of every hash it holds
    val tail = n - Multimodal.FRAME_DF_CAP
    val expectBounded = expectPairs - tail.toLong * (tail - 1) / 2
    val (bExact, bCapped, _, bRecall, _, _, bMedia, bMatch, bAgree) =
      report(dir, 100, bounded = true)
    assert(bExact == expectPairs, "truth must not depend on the rule")
    assert(bCapped == expectBounded,
      s"bounded rule must keep all rep-endpoint pairs: got $bCapped of $expectBounded")
    assert(bRecall > 0.99, s"bounded recall must be near 1, got $bRecall")
    // ... and the metric the rule is DESIGNED to hold: every media
    // still elects the global-minimum keeper
    assert(bMedia == n.toLong && bMatch == n.toLong && bAgree == 1.0,
      s"bounded keeper agreement must be exact: $bMatch/$bMedia")
    val m6 = SparkEntry.queries("m6_frame_dedup_bounded")(spark, dir)
      .select("media_id", "n_partners", "keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    val minId = rows.map(_._1).min
    assert(m6.forall(_._3 == minId),
      "every replica's keeper must be the global minimum id")
    assert(m6.forall(_._2 > 0), "every replica must have found a partner")
  }

  test("under the cap the bounded and strict rules coincide exactly") {
    // m6 pairs ⊇ m3 pairs by construction (a df≤cap hash keeps every
    // holder as a representative, so the full self-join survives), and
    // on a corpus whose max df sits under the cap the two rules are the
    // SAME operator — the backward-compatibility half of the remedy.
    // The divergence half (strict cap drops a population the bounded
    // rule keeps) is pinned on the replica fixture above.
    val dir = "/root/testdata/sf0.01"
    def byMedia(q: String): Map[Long, (Long, Long)] = {
      val out = SparkEntry.queries(q)(spark, dir)
        .select("media_id", "n_partners", "keep_id").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      spark.catalog.clearCache()
      out
    }
    val m3 = byMedia("m3_video_frame_dedup")
    val m6 = byMedia("m6_frame_dedup_bounded")
    val (_, _, _, _, _, maxDf, _, _, _) = report(dir, 100)
    assert(maxDf <= Multimodal.FRAME_DF_CAP,
      "fixture outgrew the cap — the equality pin no longer applies; " +
        "split it into the ⊇ form")
    assert(m3 == m6,
      "bounded and strict rules diverged on an under-cap corpus")
    assert(m3.values.exists(_._1 > 0), "no partners anywhere — vacuous")
  }
}
