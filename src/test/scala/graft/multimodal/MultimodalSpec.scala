package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("binary payload round-trips through the media schema with stable digests") {
    val docs = Tables.documents(spark, sfDir)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val stats = Multimodal.payloadStats(media.toDF())
    val joined = stats.join(docs, col("media_id") === col("doc_id"))
    // payload bytes == utf8 text bytes (ASCII corpus): lengths match n_chars
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).isEmpty)
    assert(stats.filter(length(col("sha256")) =!= 64).isEmpty)
  }

  test("null-text docs are dropped by the media adapter, not NPE'd in the codec") {
    // r10 self-review: a null text became a null payload and
    // FakeCodec.decode(payload.grouped) threw inside mapPartitions,
    // killing m2/x34 on any corpus with null text while the oracles
    // kept producing rows. The adapter now drops undecodable rows.
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world", "en", "web", 11L),
      (2L, null.asInstanceOf[String], "en", "web", 0L),
      (3L, "more text here", "en", "web", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.media_id).sorted.toSeq == Seq(1L, 3L),
      s"expected the null-text doc dropped, got ${feats.map(_.media_id).mkString(",")}")
    val hashes = Multimodal.perceptualHash(media).collect()
    assert(hashes.length == 2 && hashes.forall(!_.isNullAt(1)))
  }

  test("partition-wise feature extraction is distributed and deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val media = Multimodal.mediaFromDocuments(spark, docs).repartition(7)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == docs.count())
    val f = feats.filter(col("media_id") === 0).head()
    // entropy of a text corpus: strictly between 0 and 8 bits/byte
    assert(f.byte_entropy > 0 && f.byte_entropy < 8)
    assert(f.width == 8 && f.height == 8) // resized frame shape
    assert(f.n_frames_sampled >= 1)
    // deterministic across partitionings
    val feats2 = Multimodal.extractFeatures(media.repartition(3))
    assert(feats2.orderBy("media_id").collect().toSeq ==
      feats.orderBy("media_id").collect().toSeq)
  }

  test("perceptual hash: hand-computed aHash on known pixels, partition-invariant, near-dup separation") {
    import spark.implicits._
    // 1×4 grid over a 4-byte payload, width 4 ⇒ decode = one row,
    // resize(4,1) = identity: pixels (10, 20, 30, 40), sum 100;
    // bit_i = 4·u > 100 ⇒ (0, 0, 1, 1) ⇒ hash 0b0011 = 3
    val meta = Multimodal.MediaMeta("application/x-fake", 4, 1, 0L)
    val tiny = Seq(
      Multimodal.MediaRow(1L, Array[Byte](10, 20, 30, 40), meta),
      // one dimmer pixel: (10, 20, 30, 36), sum 96 ⇒ bits (0,0,1,1) — same
      Multimodal.MediaRow(2L, Array[Byte](10, 20, 30, 36), meta),
      // inverted ramp ⇒ bits flip to (1,1,0,0) = 0b1100 = 12
      Multimodal.MediaRow(3L, Array[Byte](40, 30, 20, 10), meta)).toDS()
    val got = Multimodal.perceptualHash(tiny, w = 4, h = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 12L), s"unexpected hashes: $got")
    // real corpus: deterministic across partitionings, and exact dups
    // (same text ⇒ same payload) collide at hamming 0
    val docs = Tables.documents(spark, sfDir)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val h7 = Multimodal.perceptualHash(media.repartition(7))
      .orderBy("media_id").collect().toSeq
    val h3 = Multimodal.perceptualHash(media.repartition(3))
      .orderBy("media_id").collect().toSeq
    assert(h7 == h3)
    assert(h7.forall(_.getLong(1) >= 0L), "aHash-48 must stay a positive BIGINT")
  }

  test("frame hashes: sampled ordinals, partition invariance, whole-payload consistency") {
    val docs = Tables.documents(spark, sfDir)
    val media = Multimodal.mediaFromDocuments(spark, docs, width = 32, height = 2)
    val a = Multimodal.frameHashes(media, everyN = 2).collect().toSet
    val b = Multimodal.frameHashes(media.repartition(7), everyN = 2).collect().toSet
    assert(a == b, "frame hashes depend on partitioning")
    assert(a.nonEmpty)
    // frame_no is the SAMPLED ordinal: dense from 0 per media
    val byMedia = a.toSeq.groupBy(_.getLong(0))
    byMedia.foreach { case (m, rows) =>
      val ns = rows.map(_.getLong(1)).sorted
      assert(ns == (0L until ns.length).toSeq, s"media $m frame_nos not dense: $ns")
    }
    // frame count = ceil(ceil(len/64)/2), pinned against n_chars
    val lens = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byMedia.foreach { case (m, rows) =>
      val expect = (lens(m) + 127) / 128
      assert(rows.length == expect, s"media $m: ${rows.length} frames, expected $expect")
    }
  }

  test("audio envelope hash: hand-computed windows, empty/short payloads, invariances") {
    import spark.implicits._
    // 4 windows over 8 bytes: windows (10,10) (10,10) (90,90) (90,90),
    // tot = 400, len = 8; bit iff si·8 > 400·2 ⇔ si > 100 ⇒ 0b0011 = 3
    val kernel = Multimodal.envelopeBits(
      Array[Byte](10, 10, 10, 10, 90, 90, 90, 90), 4)
    assert(kernel == 3L, s"hand-computed envelope mismatch: $kernel")
    // empty payload and len < bits must hash without dividing: empty →
    // 0; 2 bytes over 4 windows → windows (∅,(0),∅,(1)) by the integer
    // split (0,0),(0,1),(1,1),(1,2): only non-empty windows can bit
    assert(Multimodal.envelopeBits(Array.emptyByteArray, 4) == 0L)
    assert(Multimodal.envelopeBits(Array[Byte](10, 90), 4) == 1L,
      "2-byte payload: only the last window holds the loud byte")
    // LEVEL SHIFT invariance on the compare's ordering side: scaling
    // all amplitudes by a constant keeps every si·len vs tot·ni
    // ordering, so the fingerprint is identical — the re-encoded-copy
    // property the dedup rides
    val quiet = Array[Byte](10, 10, 10, 10, 90, 90, 90, 90)
    val loud = quiet.map(b => (b * 2).toByte)
    assert(Multimodal.envelopeBits(quiet, 4) == Multimodal.envelopeBits(loud, 4))
    // real corpus: partition-invariant, positive BIGINT, exact dups collide
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sfDir))
    val h7 = Multimodal.audioEnvelopeHash(media.repartition(7))
      .orderBy("media_id").collect().toSeq
    val h3 = Multimodal.audioEnvelopeHash(media.repartition(3))
      .orderBy("media_id").collect().toSeq
    assert(h7 == h3)
    assert(h7.forall(_.getLong(1) >= 0L), "ehash48 must stay a positive BIGINT")
  }

  test("dashboard html assembles from the curated layer") {
    import graft.etl._
    val base = tmpDir("graft_dash")
    SampleData.write(s"$base/raw", "2025-12")
    SampleData.writeChartOfAccounts(s"$base/reference")
    val out = Pipeline.runMonth(spark, Settings(), "2025-12",
      s"$base/raw", s"$base/curated", s"$base/reference")
    val html = Dashboard.buildHtml(spark,
      spark.read.parquet(out.fact),
      spark.read.parquet(out.dimAccounts),
      spark.read.parquet(out.kpi),
      spark.read.option("header", "true").csv(out.dqExceptions),
      spark.read.option("header", "true").csv(out.dqSummary),
      "2025-12")
    Dashboard.write(s"$base/dashboard.html", html)
    assert(html.contains("<svg") && html.contains("KPI trend"))
    assert(html.contains("TLM") || html.contains("UPE"))
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(s"$base/dashboard.html")) > 1000)
  }
}
