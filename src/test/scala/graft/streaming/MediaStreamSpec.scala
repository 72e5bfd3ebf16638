package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.multimodal.Multimodal

/** The r14 multimodal ingest loop ([[StreamingOps.mediaStreamIncremental]]
  * over [[Multimodal.curateMediaIncremental]]): the r13 verdict's item 3
  * — [[StreamingOps.frameDedupStream]] probes a STATIC index, so two
  * duplicate media arriving in different micro-batches (both absent from
  * the seed) were never paired. This spec pins the closed loop: the
  * stream equals the sequential batch composition INCLUDING those
  * cross-batch pairs, and the segment compaction + GC triad works on
  * frame segments exactly as it does on LSH segments.
  */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** a long repeated text so every twin pair shares well over
    * `minShared` sampled 64-byte frames under the 32×2 geometry.
    */
  private def longText(seed: String): String =
    (seed + " lorem ipsum dolor sit amet consectetur ") * 12

  /** shipped even-id docs as the stream body, plus two synthetic
    * cross-batch twins (same payload, ids far above the shipped range,
    * NEITHER in the seed index) split so twin A lands in batch 1 and
    * twin B in batch 3 — the exact pair the static-index probe missed.
    */
  private def streamDocs: (Seq[StreamingOps.DocRow], Long, Long) = {
    val base = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow]
      .collect().toSeq.sortBy(_.doc_id)
    val twinA = StreamingOps.DocRow(900000001L, "web", longText("twin"))
    val twinB = StreamingOps.DocRow(900000002L, "web", longText("twin"))
    (base, twinA.doc_id, twinB.doc_id) match {
      case (b, a, c) =>
        val third = math.max(1, b.size / 3)
        (b.take(third) ++ Seq(twinA) ++
          b.slice(third, 2 * third) ++
          b.drop(2 * third) ++ Seq(twinB), a, c)
    }
  }

  /** drive the stream over 3+ micro-batches; returns surviving ids. */
  private def runStream(base: String, docs: Seq[StreamingOps.DocRow],
      seed: Seq[String], trigger: Int, gc: Boolean): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.DocRow]
    val q = StreamingOps.mediaStreamIncremental(input.toDF(), seed,
      s"$base/segments", s"$base/out", s"$base/ckpt",
      compactTrigger = trigger, gcSuperseded = gc)
    docs.grouped(math.max(1, docs.size / 6)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()
    spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("media stream equals the sequential batch composition, including cross-batch twins") {
    val (docs, twinA, twinB) = streamDocs
    val seedBase = tmpDir("media_seed")
    Multimodal.writeFrameIndex(spark,
      Tables.documents(spark, sfDir).filter($"doc_id" % 2 =!= 0), seedBase)

    val streamBase = tmpDir("media_stream")
    val got = runStream(streamBase, docs, Seq(seedBase), trigger = Int.MaxValue,
      gc = false)

    // sequential composition: the same batches through the batch
    // operator, segment paths accumulating
    val seqBase = tmpDir("media_seq")
    var paths = Seq(seedBase)
    var expected = Set.empty[Long]
    docs.grouped(math.max(1, docs.size / 6)).zipWithIndex.foreach {
      case (b, i) =>
        val segPath = s"$seqBase/seg_$i"
        val survivors = Multimodal.curateMediaIncremental(
          b.toDF("doc_id", "source", "text"), paths, segPath)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        expected ++= survivors
        paths :+= segPath
        spark.catalog.clearCache()
    }
    assert(got == expected,
      s"stream diverged from the sequential composition: " +
        s"only-stream=${(got -- expected).toSeq.sorted.take(5)} " +
        s"only-seq=${(expected -- got).toSeq.sorted.take(5)}")
    assert(got.nonEmpty, "no survivors — spec is vacuous")
    // the r13 gap, pinned: twin A (first arrival, absent from seed)
    // survives; twin B (same payload, LATER batch) is deduped against
    // A's segment — the pair a static-index probe never sees
    assert(got.contains(twinA), "first-arrival twin must survive")
    assert(!got.contains(twinB),
      "cross-batch duplicate survived — the stream is not probing prior segments")
    spark.catalog.clearCache()
  }

  test("media stream with compaction + GC: output identical, artifacts bounded") {
    val (docs, _, twinB) = streamDocs
    val seedBase = tmpDir("media_seed_gc")
    Multimodal.writeFrameIndex(spark,
      Tables.documents(spark, sfDir).filter($"doc_id" % 2 =!= 0), seedBase)
    val plainBase = tmpDir("media_plain")
    val gcBase = tmpDir("media_gc")
    val plain = runStream(plainBase, docs, Seq(seedBase),
      trigger = Int.MaxValue, gc = false)
    val managed = runStream(gcBase, docs, Seq(seedBase), trigger = 2, gc = true)
    assert(managed == plain,
      "compaction/GC changed the curation output — a reachable artifact was folded or reclaimed wrongly")
    assert(!managed.contains(twinB), "cross-batch dedup must survive compaction")
    def arts(p: String): Seq[String] =
      new java.io.File(s"$p/segments").listFiles.toSeq.map(_.getName)
        .filter(n => n.startsWith("seg_") || n.startsWith("cmp_")).sorted
    assert(arts(gcBase).size < arts(plainBase).size,
      s"gc freed nothing: managed=${arts(gcBase)} plain=${arts(plainBase)}")
    assert(arts(gcBase).size <= 5,
      s"managed artifact count not bounded at trigger 2: ${arts(gcBase)}")
    assert(StreamingOps.gcWatermark(s"$gcBase/segments").nonEmpty)
    spark.catalog.clearCache()
  }

  test("compactFrameSegments re-caps across segments and preserves probe results") {
    // compaction is a pure union re-written through the shared layout
    // writer: probing (seed + cmp) must equal probing (seed + all segs)
    val (docs, _, _) = streamDocs
    val base = tmpDir("media_compact")
    var paths = Seq.empty[String]
    docs.grouped(math.max(1, docs.size / 4)).zipWithIndex.foreach {
      case (b, i) =>
        val p = s"$base/seg_$i"
        Multimodal.writeFrameIndex(spark, b.toDF("doc_id", "source", "text")
          .withColumn("n_chars", length($"text").cast("long")), p)
        paths :+= p
    }
    val cmp = s"$base/cmp_all"
    Multimodal.compactFrameSegments(spark, paths, cmp)
    def probe(idx: Seq[String]): Set[(Long, Long)] = {
      val post = Multimodal.readFrameIndexPostings(spark, idx)
      val r = post.as("a").join(post.as("b"),
          $"a.fhash48" === $"b.fhash48" && $"a.media_id" < $"b.media_id")
        .select($"a.media_id", $"b.media_id")
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      r
    }
    // sets table re-derived: every media with a posting has its set row
    val post = Multimodal.readFrameIndexPostings(spark, Seq(cmp))
    val sets = Multimodal.readFrameIndexSets(spark, Seq(cmp))
    assert(post.select("media_id").distinct().count() == sets.count(),
      "compacted sets table out of sync with its postings")
    val viaSegs = probe(paths)
    val viaCmp = probe(Seq(cmp))
    // the compacted artifact may only SHRINK the posting set (cross-
    // segment re-capping evicts hashes hot across segments) — never
    // invent a pairing
    assert(viaCmp.subsetOf(viaSegs),
      "compaction invented postings that no input segment carried")
    spark.catalog.clearCache()
  }
}
