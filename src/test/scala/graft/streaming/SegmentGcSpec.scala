package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The retention half of the LSM loop (r12 verdict): [[StreamingOps
  * .gcSegments]] must reclaim exactly the artifacts no legal replay can
  * reach — curation output over the surviving read set is IDENTICAL,
  * on-disk artifact count actually shrinks, and any attempt to
  * reconstruct a read set below the watermark fails loudly instead of
  * silently curating against a partial index.
  */
class SegmentGcSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows = Tables.documents(spark, sfDir)
    .select($"doc_id", $"source", $"text").as[StreamingOps.DocRow]

  /** drive an ingest through `nBatches` micro-batches; returns
    * (segment base, out path, curated doc_ids). */
  private def ingest(base: String, nBatches: Int, trigger: Int,
      gc: Boolean): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val seed = s"$base/seed"
    graft.corpus.Corpus.writeLshIndex(
      Tables.documents(spark, sfDir).filter($"doc_id" % 2 =!= 0), seed)
    val newDocs = docRows.filter(_.doc_id % 2 == 0)
      .collect().toSeq.sortBy(_.doc_id)
    val input = MemoryStream[StreamingOps.DocRow]
    val q = StreamingOps.curateStreamIncremental(input.toDF(), Seq(seed),
      s"$base/segments", s"$base/out", s"$base/ckpt",
      compactTrigger = trigger, gcSuperseded = gc)
    newDocs.grouped(math.max(1, newDocs.size / nBatches)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()
    spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  private def artifactNames(segBase: String): Seq[String] =
    new java.io.File(segBase).listFiles.toSeq.map(_.getName)
      .filter(n => n.startsWith("seg_") || n.startsWith("cmp_")).sorted

  test("gcSegments reclaims only unreachable artifacts: probe result identical, disk shrinks, marker set") {
    val base = tmpDir("seg_gc")
    ingest(base, nBatches = 8, trigger = 2, gc = false)
    val segBase = s"$base/segments"
    val before = artifactNames(segBase)
    val lastBatch = StreamingOps.latestCompleteVersion(segBase).get
    // the reference probe BEFORE GC, over the read set a next batch
    // would use
    def probe(): Set[(Long, Long)] = {
      spark.catalog.clearCache()
      graft.corpus.Corpus.dedupAgainstIndex(
        Tables.documents(spark, sfDir).filter($"doc_id" % 2 === 0),
        Seq(s"$base/seed") ++
          StreamingOps.segmentReadSet(segBase, lastBatch + 1), 0.5)
        .select("new_id", "index_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val beforePairs = probe()
    val deleted = StreamingOps.gcSegments(segBase, lastBatch)
    assert(deleted.nonEmpty, "trigger=2 over 8 batches left nothing to GC")
    val after = artifactNames(segBase)
    assert(after.size < before.size)
    // the retained cmp at the watermark survives, everything below is gone
    val w = StreamingOps.gcWatermark(segBase).get
    assert(after.contains(s"cmp_$w"))
    assert(after.forall { n =>
      val id = n.dropWhile(!_.isDigit).toLong
      if (n.startsWith("seg_")) id > w else id >= w
    }, s"artifact below watermark $w survived: $after")
    assert(probe() == beforePairs,
      "GC changed the dedup probe result — it took a reachable artifact")
    assert(beforePairs.nonEmpty, "no dedup pairs — spec is vacuous")
    // idempotent re-run: nothing left to take, marker unchanged
    assert(StreamingOps.gcSegments(segBase, lastBatch).isEmpty)
    assert(StreamingOps.gcWatermark(segBase) == Some(w))
    spark.catalog.clearCache()
  }

  test("a read set below the GC watermark fails loudly; above it still works") {
    val base = tmpDir("seg_gc_replay")
    ingest(base, nBatches = 8, trigger = 2, gc = false)
    val segBase = s"$base/segments"
    val lastBatch = StreamingOps.latestCompleteVersion(segBase).get
    StreamingOps.gcSegments(segBase, lastBatch)
    val w = StreamingOps.gcWatermark(segBase).get
    val ex = intercept[IllegalStateException] {
      StreamingOps.segmentReadSet(segBase, w)
    }
    assert(ex.getMessage.contains("GC watermark"))
    // the boundary: W+1 is the first batch id any legal replay can hold
    val rs = StreamingOps.segmentReadSet(segBase, w + 1)
    assert(rs == Seq(s"$segBase/cmp_$w"),
      s"batch ${w + 1} must read exactly the retained cmp, got $rs")
    spark.catalog.clearCache()
  }

  test("stream with gcSuperseded: output equals the unmanaged run, disk artifact count bounded") {
    val baseOn = tmpDir("seg_gc_on")
    val baseOff = tmpDir("seg_gc_off")
    val gcOut = ingest(baseOn, nBatches = 8, trigger = 2, gc = true)
    val plainOut = ingest(baseOff, nBatches = 8, trigger = 2, gc = false)
    assert(gcOut == plainOut,
      "in-stream GC changed curation output — it reclaimed a reachable artifact")
    assert(gcOut.nonEmpty, "no curated docs — spec is vacuous")
    // bounded: the gc run keeps the retained cmp plus the ≤ trigger+1
    // artifacts above it (steady state lags one batch behind the
    // compaction); the unmanaged run keeps one seg per batch plus every
    // cmp ever written, growing with ingest count forever
    val onArts = artifactNames(s"$baseOn/segments")
    val offArts = artifactNames(s"$baseOff/segments")
    assert(onArts.size < offArts.size,
      s"gc freed nothing: on=$onArts off=$offArts")
    assert(onArts.size <= 5,
      s"gc run's artifact count not bounded at trigger 2: $onArts")
    assert(StreamingOps.gcWatermark(s"$baseOn/segments").nonEmpty)
    spark.catalog.clearCache()
  }

  test("a sweep skips (not regresses) when another process holds the GC lock") {
    // r13 ADVICE: the marker advance was check-then-act, so a stale
    // sweep interleaved with a newer one (live-stream hook vs the CLI
    // subcommand) could move _GC_WATERMARK backward AFTER the newer
    // sweep's deletions — silently disarming the segmentReadSet guard.
    // The sweep now runs under a per-directory file lock; a contender
    // must SKIP (empty result, marker untouched), never interleave.
    val base = tmpDir("seg_gc_lock")
    ingest(base, nBatches = 8, trigger = 2, gc = false)
    val segBase = s"$base/segments"
    val lastBatch = StreamingOps.latestCompleteVersion(segBase).get
    StreamingOps.gcSegments(segBase, lastBatch)
    val w = StreamingOps.gcWatermark(segBase).get
    // simulate the other process: hold the advisory lock from a second
    // channel. Same-JVM FileLock overlap throws rather than blocks, so
    // take it from a child process instead — the exact CLI-vs-stream
    // contention the fix targets.
    val holder = new ProcessBuilder("python3", "-c",
      s"""import fcntl, time, sys
         |f = open('$segBase/._GC_LOCK', 'w')
         |fcntl.lockf(f, fcntl.LOCK_EX)  # POSIX record lock — the same
         |# namespace as Java NIO FileLock on Linux (BSD flock is NOT)
         |print('locked', flush=True)
         |time.sleep(30)""".stripMargin).redirectErrorStream(true).start()
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(holder.getInputStream))
      assert(r.readLine() == "locked", "lock-holder process failed to start")
      assert(StreamingOps.gcSegments(segBase, lastBatch).isEmpty,
        "sweep must skip while the lock is held elsewhere")
      assert(StreamingOps.gcWatermark(segBase) == Some(w),
        "a skipped sweep must not touch the watermark")
    } finally holder.destroyForcibly()
    spark.catalog.clearCache()
  }

  test("a sweep skips (not crashes) when THIS JVM already holds the GC lock through another path") {
    // the r14 self-review find: tryLock returns null only for a lock
    // held by another process — a lock held by this JVM (reachable when
    // two spellings of one directory, e.g. a symlinked data root vs its
    // real path, normalize to different monitor keys) THROWS
    // OverlappingFileLockException instead. The stated contract is
    // skip-and-retry-next-batch either way; a stream must never die to
    // a lock-shaped exception.
    val segBase = tmpDir("gc_selflock") + "/segments"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(segBase))
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(segBase, "._GC_LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock()
    try {
      // a cmp at id 0 makes the sweep body reachable (watermark branch)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(segBase, "cmp_0"))
      assert(StreamingOps.gcSegments(segBase, 5L).isEmpty,
        "sweep must skip while this JVM holds the lock")
      assert(StreamingOps.gcWatermark(segBase).isEmpty,
        "a skipped sweep must not advance the watermark")
      // the skip must not CLOSE its channel either: POSIX fcntl drops
      // every lock this process holds on a file when any fd to it
      // closes, so a closing skip would silently strip THIS lock and
      // let an external process sweep concurrently (r14 self-review)
      assert(lock.isValid,
        "the skipped sweep released the holder's lock — close() on the " +
          "skip path drops all of this process's POSIX locks on the file")
      // ... and repeated skips must reuse ONE memoized channel, not
      // open (and strand) a new fd per call — the r14 ADVICE leak: a
      // component holding the lock for the stream's lifetime would
      // otherwise cost one fd per micro-batch, unbounded
      val baseKey = java.nio.file.Paths.get(segBase).toRealPath().toString
      val chAfterFirst = StreamingOps.gcChannels.get(baseKey)
      assert(chAfterFirst != null && chAfterFirst._1.isOpen,
        "the skipped sweep must leave its memoized channel open for reuse")
      assert(StreamingOps.gcSegments(segBase, 5L).isEmpty)
      assert(StreamingOps.gcSegments(segBase, 5L).isEmpty)
      assert(StreamingOps.gcChannels.get(baseKey)._1 eq chAfterFirst._1,
        "a repeated skip opened a fresh channel instead of reusing the " +
          "memoized one — the per-batch fd leak is back")
      assert(lock.isValid, "repeated skips stripped the holder's lock")
    } finally { lock.release(); ch.close() }
  }

  test("a recreated segment directory gets a fresh lock channel, not the dead inode") {
    // an open fd survives unlink, so after a wipe-and-reseed of the
    // data root a memoized channel would "lock" the dead inode while a
    // second process locks the NEW file — mutual exclusion silently
    // void (r15 self-review). The memo entry carries the lock file's
    // fileKey and is replaced when the file on disk changes identity.
    val segBase = tmpDir("gc_recreate") + "/segments"
    val p = java.nio.file.Paths.get(segBase)
    java.nio.file.Files.createDirectories(p.resolve("cmp_0"))
    StreamingOps.gcSegments(segBase, 5L)
    val baseKey = p.toRealPath().toString
    val first = StreamingOps.gcChannels.get(baseKey)
    assert(first != null && first._1.isOpen)
    // operator wipes and re-seeds the directory at the same path
    graft.core.Scratch.deleteTree(p)
    java.nio.file.Files.createDirectories(p.resolve("cmp_0"))
    StreamingOps.gcSegments(segBase, 5L)
    val second = StreamingOps.gcChannels.get(baseKey)
    assert(second._1 ne first._1,
      "a stale channel was reused across a directory recreation")
    assert(!first._1.isOpen,
      "the dead-inode channel must be closed (nothing live can hold a " +
        "lock through an unlinked inode this process doesn't also own)")
    assert(second._1.isOpen)
  }
}
