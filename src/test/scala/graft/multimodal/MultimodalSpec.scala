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
