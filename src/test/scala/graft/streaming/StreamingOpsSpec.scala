package graft.streaming

import java.sql.Timestamp

// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Streaming semantics: each windowed transform run as a real stream
  * (MemoryStream → complete/append sink) must equal its batch execution
  * over the same data — the batch side is oracle-checked in
  * [[graft.queries.EventQueries]], so equality transfers correctness to
  * the streams.
  */
/** change-row shape for the CDC stream test — snapshot columns + op. */
final case class CdcRow(c_custkey: Long, c_name: String,
    c_mktsegment: String, c_acctbal: Double, op: String)

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def eventsBatch = Tables.eventsTs(spark, sfDir)
    .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    .as[StreamingOps.Event]

  private def runStream[T](name: String)(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Event]
    val query = build(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    val batches = eventsBatch.collect().grouped(2000).toSeq
    batches.foreach { b => input.addData(b.toSeq); query.processAllAvailable() }
    query.stop()
    spark.table(name)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("∅")).mkString("|"))
      .sorted.toSeq
  }

  test("tumbling window stream equals batch") {
    val streamed = runStream("tumble")(StreamingOps.tumblingByType(_), "complete")
    val batch = StreamingOps.tumblingByType(eventsBatch.toDF())
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("sliding window stream equals batch") {
    val streamed = runStream("slide")(StreamingOps.slidingCounts(_), "complete")
    val batch = StreamingOps.slidingCounts(eventsBatch.toDF())
    assert(canon(streamed) == canon(batch))
    // 1h window every 15min → each event lands in 4 windows
    val total = streamed.agg(sum("n")).head().getLong(0)
    assert(total == eventsBatch.count() * 4)
  }

  test("session windows stream equals batch") {
    val streamed = runStream("sess")(StreamingOps.sessionWindows(_), "complete")
    val batch = StreamingOps.sessionWindows(eventsBatch.toDF())
    assert(canon(streamed) == canon(batch))
  }

  test("stateful sessionizer matches the batch gap-sessionization counts") {
    // batch truth: lag/cumsum sessionization (oracle-checked e2_sessionize)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val batchSessions = eventsBatch.toDF()
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"value")
      .withColumn("new_sess",
        when($"ts_us" - lag("ts_us", 1).over(w) > StreamingOps.gapMs * 1000, 1).otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Event]
    val query = StreamingOps.sessionizeStateful(input.toDS())
      .writeStream.format("memory").queryName("statesess").outputMode("append").start()
    // feed in event-time order so watermark advances and closes sessions;
    // a final far-future event flushes every open session via timeout
    val ordered = eventsBatch.collect().sortBy(_.ts.getTime)
    ordered.grouped(2000).foreach { b => input.addData(b.toSeq); query.processAllAvailable() }
    input.addData(StreamingOps.Event(Long.MaxValue, new Timestamp(ordered.last.ts.getTime + 86400000L), -1L, "flush", 0.0))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("statesess").filter($"user_id" =!= -1L)
    val got = streamed.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = batchSessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("stream-stream interval join equals batch") {
    val streamed = runStream("ssjoin")(StreamingOps.purchaseClickJoin(_), "append")
    val batch = StreamingOps.purchaseClickJoin(eventsBatch.toDF())
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("stream-stream LEFT OUTER interval join equals batch, incl. null rows") {
    // outer (null-click) rows only emit once the watermark proves no
    // matching click can still arrive, so feed in event-time order and
    // close with a far-future flush event that advances both sides'
    // watermarks past all real data
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Event]
    val query = StreamingOps.purchaseClickJoinLeftOuter(input.toDF())
      .writeStream.format("memory").queryName("ssjoin_lo").outputMode("append").start()
    val ordered = eventsBatch.collect().sortBy(_.ts.getTime)
    ordered.grouped(2000).foreach { b => input.addData(b.toSeq); query.processAllAvailable() }
    // two flush batches under a sentinel user: the flushes must be typed
    // purchase/click — the watermark operators sit AFTER the side
    // filters, so a foreign event type would never reach them and the
    // watermark would stall short of the last real purchases. Batch 1
    // advances the watermark past all real data at its batch END; batch
    // 2 triggers the micro-batch in which the now-provably-unmatched
    // purchases actually emit their null rows. Sentinel rows are
    // excluded from the comparison.
    Seq(86400000L, 172800000L).zipWithIndex.foreach { case (off, i) =>
      input.addData(
        StreamingOps.Event(Long.MaxValue - 2 * i,
          new Timestamp(ordered.last.ts.getTime + off), -1L, "purchase", 0.0),
        StreamingOps.Event(Long.MaxValue - 2 * i - 1,
          new Timestamp(ordered.last.ts.getTime + off), -1L, "click", 0.0))
      query.processAllAvailable()
    }
    query.stop()
    val streamed = spark.table("ssjoin_lo").filter(col("user_id") >= 0)
    val batch = StreamingOps.purchaseClickJoinLeftOuter(eventsBatch.toDF())
    assert(canon(streamed) == canon(batch))
    // the outer join's whole point: purchases with no prior click emit too
    assert(streamed.filter(col("click_id").isNull).count() > 0)
    assert(streamed.count() > StreamingOps.purchaseClickJoin(eventsBatch.toDF()).count())
  }

  test("stateful streaming top-k equals the native batch top-k operator") {
    implicit val sqlCtx = spark.sqlContext
    val k = 3
    val input = MemoryStream[StreamingOps.Event]
    val query = StreamingOps.topPurchasesStateful(input.toDS(), k)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").start()
    // multiple micro-batches so per-key state actually evolves
    eventsBatch.collect().grouped(700).foreach { b =>
      input.addData(b.toSeq); query.processAllAvailable()
    }
    query.stop()
    // latest emission per user = the row with that user's max n_seen
    val latest = spark.table("topk_stream")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_seen").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "top_ids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val batch = graft.plans.TopK.perKey(
      eventsBatch.toDF().filter(col("event_type") === "purchase"),
      Seq("user_id"), Seq(col("value").desc, col("event_id").asc), k)
      .select("user_id", "event_id", "value")
      .collect().groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.map(r => (r.getDouble(2), r.getLong(1)))
          .sortBy { case (v, id) => (-v, id) }.map(_._2).toList
      }
    assert(latest == batch)
  }

  test("streaming dedup drops duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Event]
    val query = StreamingOps.dedupByEventId(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    val sample = eventsBatch.orderBy("ts").limit(1000).collect().toSeq
    input.addData(sample ++ sample.take(500)) // 500 in-batch duplicates
    query.processAllAvailable()
    input.addData(sample.take(100))           // late re-sends of seen ids
    query.processAllAvailable()
    query.stop()
    val got = spark.table("dedup")
    assert(got.count() == 1000)
    assert(got.groupBy("event_id").count().filter($"count" > 1).isEmpty)
  }

  test("long-horizon dedup runs bounded-state on the RocksDB state store") {
    // the 100 TB posture (Sessions.local defaults): RocksDB provider +
    // changelog checkpointing keep a 24h dedup horizon's state off-heap.
    // TestSession doesn't set it, so pin it here and prove via the
    // query's state-operator metrics that RocksDB actually served.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamingOps.Event]
      val query = StreamingOps.dedupByEventId(input.toDF(), watermark = "24 hours")
        .writeStream.format("memory").queryName("rocksdedup").outputMode("append").start()
      val sample = eventsBatch.orderBy("ts").collect().toSeq // sf0.001: 1000 events
      input.addData(sample); query.processAllAvailable()
      input.addData(sample.take(700)); query.processAllAvailable() // re-sends inside the horizon
      val stateMetrics = query.recentProgress.flatMap(_.stateOperators)
        .flatMap(so => scala.jdk.CollectionConverters.MapHasAsScala(so.customMetrics).asScala.keys)
      query.stop()
      assert(spark.table("rocksdedup").count() == sample.length.toLong)
      assert(spark.table("rocksdedup").groupBy("event_id").count().filter($"count" > 1).isEmpty)
      assert(stateMetrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state metrics; saw: ${stateMetrics.distinct.mkString(", ")}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("file-source stream restarts from its checkpoint without duplicating output") {
    val base = tmpDir("graft_ckpt")
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val all = eventsBatch.orderBy("event_id").limit(3000).cache()
    val schema = all.schema
    // glob: the file source lists files per matched directory
    def startQuery() = spark.readStream.schema(schema).parquet(s"$inDir/*")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()

    all.filter($"event_id" < 1500).write.mode("overwrite").parquet(s"$inDir/batch1")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // restart from the same checkpoint with more data present
    all.filter($"event_id" >= 1500).write.mode("overwrite").parquet(s"$inDir/batch2")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == all.count())
    assert(out.groupBy("event_id").count().filter($"count" > 1).isEmpty)
  }

  test("streaming incremental dedup against the persisted index equals batch x10") {
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val idxPath = java.nio.file.Files
      .createTempDirectory("stream_lsh_index").toString
    graft.corpus.Corpus.writeLshIndex(docsDf.filter($"doc_id" % 2 =!= 0), idxPath)
    val newDocs = docsDf.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow].collect().toSeq
    val input = MemoryStream[StreamingOps.DocRow]
    val query = StreamingOps.dedupStreamAgainstIndex(input.toDF(), idxPath)
      .writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    // two micro-batches: the pair dedup state must carry across them
    val (b1, b2) = newDocs.partition(_.doc_id % 4 == 0)
    input.addData(b1); query.processAllAvailable()
    input.addData(b2); query.processAllAvailable()
    val got = spark.table("streamdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    query.stop()
    val expected = graft.corpus.Corpus
      .dedupAgainstIndex(docsDf.filter($"doc_id" % 2 === 0), idxPath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "no cross pairs — spec is vacuous")
    spark.catalog.clearCache()
  }

  test("frameDedupStream refuses an index without the df-capped layout marker") {
    // an index written before the cap moved to write time (r11) still
    // carries unbounded posting lists; the probe must fail at stream
    // CONSTRUCTION, not quietly re-inherit the hot-hash fan-out
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val idxPath = java.nio.file.Files
      .createTempDirectory("stale_frame_index").toString
    graft.multimodal.Multimodal.writeFrameIndex(
      spark, docsDf.filter($"doc_id" % 2 =!= 0), idxPath)
    java.nio.file.Files.delete(java.nio.file.Paths.get(idxPath,
      graft.multimodal.Multimodal.FRAME_INDEX_LAYOUT_FILE))
    val input = MemoryStream[StreamingOps.DocRow]
    val e = intercept[IllegalArgumentException](
      StreamingOps.frameDedupStream(input.toDF(), idxPath))
    assert(e.getMessage.contains("layout marker"))
  }

  test("streaming frame-hash dedup against the persisted index equals the batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val idxPath = java.nio.file.Files
      .createTempDirectory("stream_frame_index").toString
    graft.multimodal.Multimodal.writeFrameIndex(
      spark, docsDf.filter($"doc_id" % 2 =!= 0), idxPath)
    val newDocs = docsDf.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow].collect().toSeq
    val input = MemoryStream[StreamingOps.DocRow]
    val query = StreamingOps.frameDedupStream(input.toDF(), idxPath)
      .writeStream.format("memory").queryName("framededup")
      .outputMode("append").start()
    val (b1, b2) = newDocs.partition(_.doc_id % 4 == 0)
    input.addData(b1); query.processAllAvailable()
    input.addData(b2); query.processAllAvailable()
    val got = spark.table("framededup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    query.stop()
    // batch composition on the same index under the r15 bounded rule:
    // candidates = new distinct (media, hash) × the index's REP
    // postings; emitted shared count = |carried raw set ∩ index
    // evidence set| (the verify the stream recomputes per pair)
    import graft.multimodal.Multimodal
    import org.apache.spark.sql.functions.{array_intersect, collect_set, size}
    val newFh = Multimodal.frameHashes(
      Multimodal.mediaFromDocuments(spark, docsDf.filter($"doc_id" % 2 === 0),
        width = 32, height = 2), everyN = 2)
      .select("media_id", "fhash48").distinct()
    val newSets = newFh.groupBy("media_id").agg(collect_set("fhash48").as("nfhs"))
    val idx = spark.read.parquet(s"$idxPath/postings")
    val idxSets = spark.read.parquet(s"$idxPath/sets")
      .select($"media_id".as("index_id"), $"fhs".as("ifhs"))
    val expected = newFh.as("a")
      .join(idx.as("b"), $"a.fhash48" === $"b.fhash48")
      .select($"a.media_id".as("new_id"), $"b.media_id".as("index_id"))
      .distinct()
      .join(newSets.withColumnRenamed("media_id", "new_id"), Seq("new_id"))
      .join(idxSets, Seq("index_id"))
      .select($"new_id", $"index_id",
        size(array_intersect($"nfhs", $"ifhs")).cast("long").as("shared"))
      .filter($"shared" >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "no cross-index frame pairs -- spec is vacuous")
    spark.catalog.clearCache()
  }

  test("streaming incremental curation threads per-batch segments and equals the sequential batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val base = tmpDir("stream_curate_inc")
    val seed = s"$base/seed"
    graft.corpus.Corpus.writeLshIndex(docsDf.filter($"doc_id" % 2 =!= 0), seed)
    val newDocs = docsDf.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow]
      .collect().toSeq.sortBy(_.doc_id)
    val mid = newDocs(newDocs.size / 2).doc_id
    val (b1, b2) = newDocs.partition(_.doc_id < mid)

    val input = MemoryStream[StreamingOps.DocRow]
    val query = StreamingOps.curateStreamIncremental(input.toDF(), Seq(seed),
      s"$base/segments", s"$base/out", s"$base/ckpt")
    input.addData(b1); query.processAllAvailable()
    input.addData(b2); query.processAllAvailable()
    query.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // the API's promise: foreachBatch == the batch library applied
    // per micro-batch with the segment list threaded through
    val e1 = graft.corpus.Corpus.curateIncremental(
        docsDf.filter($"doc_id" % 2 === 0 && $"doc_id" < mid),
        Seq(seed), s"$base/eseg_0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val e2 = graft.corpus.Corpus.curateIncremental(
        docsDf.filter($"doc_id" % 2 === 0 && $"doc_id" >= mid),
        Seq(seed, s"$base/eseg_0"), s"$base/eseg_1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == (e1 ++ e2))
    assert(got.nonEmpty && got.size < newDocs.size,
      "nothing was deduped — spec is vacuous")
    // one immutable segment per micro-batch, output partitioned by batch
    Seq(s"$base/segments/seg_0/signatures", s"$base/segments/seg_1/signatures",
        s"$base/out/batch_id=0", s"$base/out/batch_id=1").foreach { p =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)), p)
    }
    spark.catalog.clearCache()
  }

  test("incremental curation survives a kill + restart from the checkpoint: batch 2 on a NEW query equals the sequential run") {
    // the production contract the replay-idempotence tests only
    // approximate: the first query is STOPPED after batch 0 commits, a
    // brand-new StreamingQuery object is started from the same
    // checkpoint directory, and batch 1 must (a) resume the batchId
    // sequence from the offset log, (b) see batch 0's published segment
    // in its dedup set, and (c) produce exactly the sequential batch
    // composition — no lost, duplicated, or re-numbered work.
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val base = tmpDir("stream_curate_crash")
    val seed = s"$base/seed"
    graft.corpus.Corpus.writeLshIndex(docsDf.filter($"doc_id" % 2 =!= 0), seed)
    val newDocs = docsDf.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow]
      .collect().toSeq.sortBy(_.doc_id)
    val mid = newDocs(newDocs.size / 2).doc_id
    val (b1, b2) = newDocs.partition(_.doc_id < mid)

    val input = MemoryStream[StreamingOps.DocRow]
    val q1 = StreamingOps.curateStreamIncremental(input.toDF(), Seq(seed),
      s"$base/segments", s"$base/out", s"$base/ckpt")
    input.addData(b1); q1.processAllAvailable()
    q1.stop() // "crash": the query object is gone; only ckpt + artifacts remain

    input.addData(b2)
    val q2 = StreamingOps.curateStreamIncremental(input.toDF(), Seq(seed),
      s"$base/segments", s"$base/out", s"$base/ckpt")
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val e1 = graft.corpus.Corpus.curateIncremental(
        docsDf.filter($"doc_id" % 2 === 0 && $"doc_id" < mid),
        Seq(seed), s"$base/eseg_0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val e2 = graft.corpus.Corpus.curateIncremental(
        docsDf.filter($"doc_id" % 2 === 0 && $"doc_id" >= mid),
        Seq(seed, s"$base/eseg_0"), s"$base/eseg_1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == (e1 ++ e2),
      s"restart diverged from sequential: extra=${(got -- (e1 ++ e2)).take(3)} " +
        s"missing=${((e1 ++ e2) -- got).take(3)}")
    assert(got.nonEmpty && got.size < newDocs.size,
      "nothing was deduped — spec is vacuous")
    // the restarted query CONTINUED the batchId sequence (0 then 1) and
    // published exactly one segment + one output partition per batch
    Seq(s"$base/segments/seg_0/signatures", s"$base/segments/seg_1/signatures",
        s"$base/out/batch_id=0", s"$base/out/batch_id=1").foreach { p =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)), p)
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/out/batch_id=2")),
      "restart re-numbered instead of resuming the offset log")
    assert(StreamingOps.latestCompleteVersion(s"$base/segments") == Some(1L))
    spark.catalog.clearCache()
  }

  test("auto-compaction under the LSM trigger leaves curation output identical and shrinks the read set") {
    // the r11 gap: compactSegments existed but nothing CALLED it. Here
    // the same corpus streams through two ingest loops — one with the
    // trigger forced low (compact after every 2 read paths), one with
    // compaction disabled — and the curated outputs must be doc-for-doc
    // identical (compaction is a pure union), while the triggered run
    // must actually have compacted (cmp_ artifacts exist) and its final
    // batch must read FEWER paths than batches written.
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val base = tmpDir("stream_curate_autocmp")
    val seed = s"$base/seed"
    graft.corpus.Corpus.writeLshIndex(docsDf.filter($"doc_id" % 2 =!= 0), seed)
    val newDocs = docsDf.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow]
      .collect().toSeq.sortBy(_.doc_id)
    val batches = newDocs.grouped(math.max(1, newDocs.size / 6)).toSeq

    def run(tag: String, trigger: Int): Set[Long] = {
      val input = MemoryStream[StreamingOps.DocRow]
      val q = StreamingOps.curateStreamIncremental(input.toDF(), Seq(seed),
        s"$base/$tag/segments", s"$base/$tag/out", s"$base/$tag/ckpt",
        compactTrigger = trigger)
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      spark.read.parquet(s"$base/$tag/out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val auto = run("auto", trigger = 2)
    val manual = run("manual", trigger = Int.MaxValue)
    assert(auto == manual,
      s"auto-compaction changed curation: extra=${(auto -- manual).take(3)} " +
        s"missing=${(manual -- auto).take(3)}")
    assert(auto.nonEmpty && auto.size < newDocs.size,
      "nothing was deduped — spec is vacuous")
    val cmps = new java.io.File(s"$base/auto/segments").listFiles.toSeq
      .map(_.getName).filter(_.startsWith("cmp_"))
    assert(cmps.nonEmpty, "trigger=2 over 6+ batches never compacted")
    assert(new java.io.File(s"$base/manual/segments").listFiles.toSeq
      .forall(!_.getName.startsWith("cmp_")),
      "disabled trigger still compacted")
    // the NEXT batch's read set is bounded by the trigger+1 (one fresh
    // cmp plus the segments after it), while the unmanaged layout pays
    // one path per batch forever
    val autoRs = StreamingOps.segmentReadSet(
      s"$base/auto/segments", batches.size)
    val manualRs = StreamingOps.segmentReadSet(
      s"$base/manual/segments", batches.size)
    assert(manualRs.size == batches.size)
    assert(autoRs.size < manualRs.size && autoRs.size <= 3,
      s"read set not bounded: auto=${autoRs.size} manual=${manualRs.size}")
    // re-firing the trigger for an already-compacted id is a no-op —
    // the replay case of a batch whose compaction committed before a
    // crash
    assert(!StreamingOps.maybeCompactSegments(spark,
      s"$base/auto/segments", cmps.map(_.stripPrefix("cmp_").toLong).max, 0))
    spark.catalog.clearCache()
  }

  test("streaming curate-ingest (gate → dedup → normalize) equals its batch execution") {
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val docs = docsDf.select($"doc_id", $"source", $"text")
      .as[StreamingOps.DocRow].collect().toSeq
    val input = MemoryStream[StreamingOps.DocRow]
    val query = StreamingOps.curateIngestStream(input.toDF())
      .writeStream.format("memory").queryName("curateingest")
      .outputMode("append").start()
    // batch 1 is ingested TWICE (once again alongside batch 2): the
    // digest-dedup state must swallow the replay across micro-batches —
    // this corpus has no exact dups of its own post-gate, so the replay
    // is what actually exercises the dedup key
    val (b1, b2) = docs.partition(_.doc_id % 2 == 0)
    input.addData(b1); query.processAllAvailable()
    input.addData(b1 ++ b2); query.processAllAvailable()
    val gotRows = spark.table("curateingest").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    query.stop()
    // batch truth: same gate + digest-distinct + normalize
    val expected = graft.corpus.Corpus.normalize(
        graft.corpus.Corpus.qualitySignals(docsDf).filter($"keep"))
      .select(md5($"text").as("digest"), $"norm").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotRows.toSet == expected)
    assert(gotRows.nonEmpty)
    // row count (not set size): a broken dedup key would re-emit the
    // replayed batch as duplicate sink rows that a Set would hide
    assert(gotRows.size == expected.size)
  }

  test("streaming MinHash sketch equals the batch x9 aggregator, and dup re-ingest is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow].collect().toSeq
    val input = MemoryStream[StreamingOps.DocRow]
    val query = StreamingOps.minhashSketchStream(input.toDS())
      .writeStream.format("memory").queryName("sketchstream").outputMode("update").start()
    // two batches exercise cross-batch state merge
    val (b1, b2) = docs.partition(_.doc_id % 2 == 0)
    input.addData(b1); query.processAllAvailable()
    input.addData(b2); query.processAllAvailable()
    val afterAll = spark.table("sketchstream").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // batch truth: the oracle-checked x9 UDAF over the same documents
    val want = graft.SparkEntry.queries("x9_minhash_sketch_agg")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // the LAST emission per source must equal the batch sketch; emissions
    // arrive in batch order, so take each source's final row
    val lastPerSource = afterAll.zipWithIndex.groupBy(_._1._1)
      .map { case (src, rows) => src -> rows.maxBy(_._2)._1._2 }
    assert(lastPerSource == want)
    // re-ingesting every document again cannot move a min
    input.addData(docs); query.processAllAvailable()
    val again = spark.table("sketchstream").collect()
      .map(r => (r.getString(0), r.getString(1))).zipWithIndex
      .groupBy(_._1._1).map { case (src, rows) => src -> rows.maxBy(_._2)._1._2 }
    query.stop()
    assert(again == want)
  }

  test("streaming KMV sketches equal the batch z10 rows; duplicate re-ingest is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow].collect().toSeq
    val input = MemoryStream[StreamingOps.DocRow]
    val query = StreamingOps.kmvSketchStream(input.toDS())
      .writeStream.format("memory").queryName("kmvstream").outputMode("update").start()
    // two batches exercise the cross-batch k-minima state merge
    val (b1, b2) = docs.partition(_.doc_id % 2 == 0)
    input.addData(b1); query.processAllAvailable()
    input.addData(b2); query.processAllAvailable()
    def lastPerSource = spark.table("kmvstream").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).zipWithIndex
      .groupBy(_._1._1).map { case (src, rows) => src -> rows.maxBy(_._2)._1._2 }
    val got = lastPerSource
    // batch truth: the oracle-checked z10 per-source rows (the '__all__'
    // merge row is sketch algebra over those rows, not a stream key)
    val want = graft.SparkEntry.queries("z10_kmv_distinct")(spark, sfDir)
      .collect().filter(_.getString(0) != "__all__")
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want)
    // a full duplicate re-ingest cannot move any k-minimum
    input.addData(docs); query.processAllAvailable()
    val again = lastPerSource
    query.stop()
    assert(again == want)
    spark.catalog.clearCache()
  }

  test("streaming count-min cells equal the batch sketch, and the z7 estimates read off them") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.MinHashFamily
    val users = Tables.events(spark, sfDir).select($"user_id").as[Long].collect().toSeq
    val input = MemoryStream[StreamingOps.CmsEvent]
    val query = StreamingOps.cmsCellsStream(input.toDS())
      .writeStream.format("memory").queryName("cmsstream").outputMode("update").start()
    // two micro-batches exercise cross-batch cell-state accumulation
    val (b1, b2) = users.zipWithIndex.partition(_._2 % 2 == 0)
    input.addData(b1.map(t => StreamingOps.CmsEvent(t._1))); query.processAllAvailable()
    input.addData(b2.map(t => StreamingOps.CmsEvent(t._1))); query.processAllAvailable()
    val emissions = spark.table("cmsstream").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).zipWithIndex
    query.stop()
    // last emission per cell = the final sketch state
    val got = emissions.groupBy(t => (t._1._1, t._1._2))
      .map { case (cell, rows) => cell -> rows.maxBy(_._2)._1._3 }
    // batch truth, recomputed independently with the shared hash family
    val expected = users.flatMap { u =>
      val base = MinHashFamily.base(u.toString)
      (0 until 4).map(k => (k, MinHashFamily.hash(k, base) % 64L))
    }.groupBy(identity).map { case (cell, hits) => cell -> hits.size.toLong }
    assert(got == expected)
    // the oracle-checked z7 top-10 estimates must read straight off the
    // streamed cells (min over the key's K cells)
    val top = graft.SparkEntry.queries("z7_cms_heavy_hitters")(spark, sfDir).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val (uid, cms) = (r.getLong(1), r.getLong(3))
      val base = MinHashFamily.base(uid.toString)
      val est = (0 until 4).map(k => got((k, MinHashFamily.hash(k, base) % 64L))).min
      assert(est == cms, s"user $uid: streamed-cell estimate $est != batch z7 $cms")
    }
  }

  test("streaming daily anomaly report equals the batch moments and e9's flag set") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.DayObs]
    val query = StreamingOps.dailyAnomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anom").outputMode("update").start()
    val obs = eventsBatch.toDF()
      .selectExpr("event_type", "cast(unix_micros(ts) div 86400000000 as int) as epoch_day")
      .as[StreamingOps.DayObs].collect()
    // 3 uneven chunks: the report must be micro-batch-slicing-invariant
    Seq(obs.take(1000), obs.slice(1000, 1500), obs.drop(1500)).foreach { b =>
      input.addData(b.toSeq); query.processAllAvailable()
    }
    query.stop()
    // latest emitted row per (type, day) — memory sink appends in batch order
    val last = spark.table("anom").collect().zipWithIndex
      .groupBy(r => (r._1.getString(0), r._1.getString(1)))
      .map { case (_, g) => g.maxBy(_._2)._1 }.toSet
    // batch truth with the SAME exact-integer two-pass formula
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val daily = eventsBatch.toDF()
      .select($"event_type", to_date($"ts").cast("string").as("day"))
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    type Out = (String, String, Long, Double, Double, Double, Boolean)
    val expected = daily.groupBy(_._1).flatMap { case (tpe, rows) =>
      val ns = rows.map(_._3)
      val (n, s1, s2) = (ns.size, ns.sum, ns.map(v => v * v).sum)
      if (n < 2) Seq.empty[Out]
      else {
        val mu = r6(s1.toDouble / n)
        val sigma = r6(math.sqrt(math.max(
          (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1), 0.0)))
        if (sigma <= 0) Seq.empty[Out]
        else rows.toSeq.map { case (_, day, c) =>
          val z = r6((c - mu) / sigma)
          (tpe, day, c, mu, sigma, z, math.abs(z) >= 2.0)
        }
      }
    }.toSet
    val streamedTuples = last.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(streamedTuples == expected)
    // the flagged subset is exactly the oracle-checked e9 report's rows
    val e9 = graft.SparkEntry.queries("e9_daily_anomaly")(spark, sfDir)
      .select("event_type", "day").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val streamedFlags = streamedTuples.filter(_._7).map(t => (t._1, t._2))
    assert(streamedFlags == e9)
  }

  test("streaming CDC upsert maintains versioned snapshots equal to sequential batch merges") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("stream_cdc")
    val snap0 = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", $"c_mktsegment", $"c_acctbal")
    snap0.write.parquet(s"$base/seed")
    // batch 2 updates a key batch 1 INSERTED and deletes a key batch 1
    // UPDATED — the cross-batch dependencies that only hold if each
    // version really derives from the previous one
    val b1 = Seq(
      CdcRow(1L, "upd-1", "MERGED", 111.0, "U"),
      CdcRow(2L, "gone", "X", 0.0, "D"),
      CdcRow(900001L, "new-1", "FRESH", 0.0, "I"))
    val b2 = Seq(
      CdcRow(900001L, "new-1b", "MERGED", 5.0, "U"),
      CdcRow(1L, "gone", "X", 0.0, "D"),
      CdcRow(900002L, "new-2", "FRESH", 1.0, "I"))

    val input = MemoryStream[CdcRow]
    val query = StreamingOps.cdcUpsertStream(input.toDF(), s"$base/seed",
      s"$base/snapshots", s"$base/ckpt", "c_custkey")
    input.addData(b1); query.processAllAvailable()
    input.addData(b2); query.processAllAvailable()
    query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    val e1 = graft.core.Merge.scd1Upsert(snap0, b1.toDF(), "c_custkey")
    val e2 = graft.core.Merge.scd1Upsert(e1, b2.toDF(), "c_custkey")
    assert(rows(spark.read.parquet(s"$base/snapshots/v_0")) == rows(e1))
    val v1 = rows(spark.read.parquet(s"$base/snapshots/v_1"))
    assert(v1 == rows(e2))
    // semantic spot checks on the final version
    assert(!v1.exists(_._1 == 1L) && !v1.exists(_._1 == 2L), "deletes not applied")
    assert(v1.exists(t => t._1 == 900001L && t._2 == "new-1b"),
      "update of a previously inserted key lost")
    assert(v1.exists(t => t._1 == 900002L && t._2 == "new-2"), "insert lost")
    // two deletes (k=2, then k=1), two inserts (900001, 900002)
    assert(v1.size == snap0.count() - 2 + 2, "row accounting off")

    // retention sweep: keepLast = 1 would break replay (a replayed
    // batch reads the SECOND-newest version) — rejected up front
    intercept[IllegalArgumentException] {
      StreamingOps.vacuumSnapshotVersions(s"$base/snapshots", keepLast = 1)
    }
    // with a third version on disk, keep-2 removes only v_0
    spark.read.parquet(s"$base/snapshots/v_1")
      .write.parquet(s"$base/snapshots/v_2")
    val deleted = StreamingOps.vacuumSnapshotVersions(s"$base/snapshots", keepLast = 2)
    assert(deleted == Seq(0L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/snapshots/v_0")))
    assert(rows(spark.read.parquet(s"$base/snapshots/v_1")) == v1,
      "vacuum touched the retained version")
    // idempotent: nothing left to delete
    assert(StreamingOps.vacuumSnapshotVersions(s"$base/snapshots", keepLast = 2).isEmpty)

    // two ops on one key in a single batch would duplicate the snapshot
    // row (the 'multiple source rows matched' condition) — fail-fast
    val dup = Seq(
      CdcRow(7L, "first", "X", 1.0, "I"),
      CdcRow(7L, "second", "X", 2.0, "U")).toDF()
    val ex = intercept[IllegalArgumentException] {
      graft.core.Merge.scd1Upsert(snap0, dup, "c_custkey")
    }
    assert(ex.getMessage.contains("multiple change rows"), ex.getMessage)
  }

  test("atomic publish: a concurrent reader never lists a partial snapshot version") {
    // the serving contract behind the staged-rename publish: while the
    // CDC stream writes versions, a reader thread hammers the listing —
    // every version it ever observes must already be COMPLETE (_SUCCESS
    // present the instant the name is visible), and the _LATEST pointer
    // must exist only for complete versions and never move backward.
    // Under the old in-place `df.write.parquet(v_N)` the directory was
    // listable for the whole parquet job before _SUCCESS landed, which
    // this poller catches reliably.
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("stream_cdc_atomic")
    val snapDir = s"$base/snapshots"
    Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", $"c_mktsegment", $"c_acctbal")
      .write.parquet(s"$base/seed")

    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stopPoll = false
    val poller = new Thread(() => {
      var lastPtr = -1L
      val p = java.nio.file.Paths.get(snapDir)
      while (!stopPoll) {
        if (java.nio.file.Files.exists(p)) {
          // pointer FIRST, listing second: versions are never deleted in
          // this run, so a version pointed at t0 must be in any listing
          // taken after t0 — the reverse order would race a publish
          // landing between the two reads
          val ptrOpt = StreamingOps.latestCompleteVersion(snapDir)
          val ls = java.nio.file.Files.list(p)
          val names =
            try {
              import scala.jdk.CollectionConverters._
              ls.iterator().asScala.map(_.getFileName.toString).toList
            } finally ls.close()
          names.filter(_.startsWith("v_")).foreach { n =>
            if (!java.nio.file.Files.exists(p.resolve(n).resolve("_SUCCESS")))
              violations.add(s"listed $n without _SUCCESS")
          }
          ptrOpt.foreach { ptr =>
            if (ptr < lastPtr) violations.add(s"pointer went back $lastPtr -> $ptr")
            if (!names.contains(s"v_$ptr"))
              violations.add(s"pointer at $ptr but v_$ptr not listed")
            lastPtr = math.max(lastPtr, ptr)
          }
        }
        Thread.onSpinWait()
      }
    })
    poller.start()

    val input = MemoryStream[CdcRow]
    val query = StreamingOps.cdcUpsertStream(input.toDF(), s"$base/seed",
      snapDir, s"$base/ckpt", "c_custkey")
    try {
      (0 until 3).foreach { i =>
        input.addData(Seq(
          CdcRow(910000L + i, s"new-$i", "FRESH", i.toDouble, "I"),
          CdcRow(1L + i, s"upd-$i", "MERGED", 1.0, "U")))
        query.processAllAvailable()
      }
    } finally {
      query.stop()
      stopPoll = true
      poller.join(10000)
    }
    assert(violations.isEmpty, violations.toArray.mkString("; "))
    // the pointer serves the newest complete version
    assert(StreamingOps.latestCompleteVersion(snapDir).contains(2L))
    assert(spark.read.parquet(s"$snapDir/v_2").count() > 0)
    // no staging debris survives a clean run
    val leftover = {
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(snapDir))
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(".stage_")).toList
      } finally ls.close()
    }
    assert(leftover.isEmpty, s"staging debris: $leftover")
  }

  test("continuously maintained clusters: final streamed labels equal the full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.documents(spark, sfDir)
    val base = tmpDir("stream_clusters")
    // seed: the even half, clustered and indexed (yesterday's corpus)
    val evens = docsDf.filter($"doc_id" % 2 === 0)
    graft.corpus.Corpus.writeLshIndex(evens, s"$base/seed_idx")
    graft.corpus.Corpus.dupClusters(evens).select("doc_id", "cluster_id")
      .write.parquet(s"$base/seed_labels")
    spark.catalog.clearCache()

    val odds = docsDf.filter($"doc_id" % 2 =!= 0)
      .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow]
      .collect().toSeq.sortBy(_.doc_id)
    val mid = odds(odds.size / 2).doc_id
    val (b1, b2) = odds.partition(_.doc_id < mid)

    val input = MemoryStream[StreamingOps.DocRow]
    // compactTrigger = 1: batch 1 folds batch 0's segment into cmp_1
    // mid-run, so the rebuild-equality below ALSO proves the cluster
    // stream's auto-compaction changes nothing (the curate stream's
    // dedicated spec covers the policy in depth)
    val query = StreamingOps.clusterMaintainStream(input.toDF(),
      Seq(s"$base/seed_idx"), s"$base/seed_labels", s"$base/state",
      s"$base/ckpt", compactTrigger = 1)
    input.addData(b1); query.processAllAvailable()
    input.addData(b2); query.processAllAvailable()
    query.stop()
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$base/state/segments/cmp_1")), "trigger=1 never compacted")

    // after two batches the label table covers evens + all odds and
    // equals the batch rebuild over the whole corpus — merges across
    // batch boundaries and into the seed included
    val got = spark.read.parquet(s"$base/state/labels/v_1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = graft.corpus.Corpus.dupClusters(docsDf)
      .select("doc_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.size == docsDf.count())
    // v_0 was the intermediate state: evens + batch 1 only
    val v0 = spark.read.parquet(s"$base/state/labels/v_0")
    assert(v0.count() == evens.count() + b1.size)
    // each batch left an immutable segment for its successors
    Seq("seg_0", "seg_1").foreach { n =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/state/segments/$n/signatures")), n)
    }
    spark.catalog.clearCache()
  }

  test("json props parse on the streaming path") {
    val streamed = runStream("props")(
      df => StreamingOps.withParsedProps(
        df.withColumn("props", concat(lit("{\"k\": "), $"event_id" % 100, lit("}")))
      ).withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "1 day").as("w"))
        .agg(sum("k").as("sum_k")).select($"w.start".as("d"), $"sum_k"),
      "complete")
    assert(streamed.agg(sum("sum_k")).head().getLong(0) > 0)
  }

  test("streaming inter-arrival profile equals the batch e12 operator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.GapEvent]
    val query = StreamingOps.interarrivalStream(input.toDS())
      .writeStream.format("memory").queryName("gapstream").outputMode("update").start()
    // time-ordered feed across non-overlapping micro-batches — the
    // watermark discipline of a real ingest; cross-batch gaps exercise
    // the last_ts state carry
    val ordered = Tables.eventsTs(spark, sfDir)
      .select($"event_type", $"event_id", unix_micros($"ts").as("ts_us"))
      .as[StreamingOps.GapEvent].collect()
      .sortBy(r => (r.ts_us, r.event_id)).toSeq
    ordered.grouped(1500).foreach { b => input.addData(b); query.processAllAvailable() }
    query.stop()
    // latest (cumulative) emission per type = the row with max n_gaps
    val streamed = spark.table("gapstream").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .groupBy(_._1).map { case (t, rows) => t -> rows.map(_._2).maxBy(_._1) }
    val batch = graft.SparkEntry.queries("e12_interarrival_stats")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
