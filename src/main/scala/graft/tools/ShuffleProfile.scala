package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.SparkEntry
import graft.core.Sessions

/** Dev tool: per-query SHUFFLE/SPILL accounting — the data-movement
  * record behind the wall-clock numbers. Wall-clock answers "is it
  * fast on this box"; shuffle bytes answer the 100 TB question "how
  * much data crosses the exchanges", which is what actually prices a
  * query on a 1000-executor cluster (network + disk, the terms that
  * dominate once the corpus no longer fits one machine's page cache).
  * Spill bytes flag any operator whose per-partition working set
  * outgrows the executor at this SF — the first thing that breaks at
  * 10× data.
  *
  * Method: a SparkListener sums task-level metrics (shuffle bytes
  * read/written, input bytes, memory/disk spill) between per-query
  * fences; each query runs once on a cold cache (clearCache before and
  * after, same as the bench contract) with a count() action. Bytes are
  * DETERMINISTIC for a fixed plan+data (unlike wall-clock), so one
  * pass is a stable record — noise only enters through AQE's runtime
  * coalescing, which changes partition counts, not bytes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ShuffleProfile [q ...]
  * (default: the bench headline heavies). Prints one JSON line per
  * query and a closing summary line.
  */
object ShuffleProfile {
  private val defaults = Seq(
    "x2_dedup_minhash_lsh", "x4_dedup_ngram_jaccard", "x20_containment_dedup",
    "x28_weighted_jaccard", "x32_lsh_recall_report", "x29_dedup_clusters_update",
    "x11_dedup_clusters", "x26_semantic_clusters", "x27_pagerank",
    "x21_curate_incremental", "t14_substring_dedup", "f20_fuzzy_pairs_blocked",
    "y11_importance_sampling", "t16_stupid_backoff", "z10_kmv_distinct",
    "z11_kmv_set_ops", "h1_shipping_priority", "h7_sole_fault_suppliers")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("shuffle-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.cpus))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the partition-sizing lever (runtime-settable conf): lets the sf1
    // spill-boundary record show the fix measured, not just named
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    // diagnostic knob (r13): raise/lower the broadcast threshold to
    // bracket plan-transition-driven byte growth (e.g. the x20 verify
    // joins flipping broadcast → SMJ between sf1 and sf3)
    sys.env.get("SPARK_GRAFT_ABJT")
      .foreach(v => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    // generic diagnostic confs: SPARK_GRAFT_CONF="k=v;k=v" (r15 — the
    // per-experiment knobs like graft.candidate.shuffleHash). A
    // malformed segment fails LOUDLY before any query runs — a silent
    // skip would invalidate the whole (expensive) profiling run's
    // premise, and a bare MatchError names nothing.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      if (kv.nonEmpty) kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k, v)
        case _ => sys.error(
          s"SPARK_GRAFT_CONF segment '$kv' is not k=v; nothing was profiled")
      }
    })
    val names = if (args.nonEmpty) args.toSeq
      else sys.env.get("SPARK_GRAFT_PROFILE_ONLY")
        .map(_.split(",").toSeq).getOrElse(defaults)

    val shufRead = new AtomicLong; val shufWrite = new AtomicLong
    val input = new AtomicLong; val memSpill = new AtomicLong
    val diskSpill = new AtomicLong; val tasks = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          input.addAndGet(m.inputMetrics.bytesRead)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          tasks.incrementAndGet()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def mb(l: Long): Double = math.round(l / 1048.576) / 1000.0
    val out = names.flatMap { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"""{"query":"$n","error":"unknown"}"""); None
        case Some(q) =>
          spark.catalog.clearCache()
          Seq(shufRead, shufWrite, input, memSpill, diskSpill, tasks)
            .foreach(_.set(0L))
          val t0 = System.nanoTime()
          // toRdd, NOT count(): count() re-optimizes with zero output
          // columns, and Catalyst then ELIMINATES final left joins whose
          // right side is grouped on the join key (provably unique, no
          // columns referenced) — m3/x34 profiled as 3-task no-shuffle
          // plans. toRdd executes the query's own physical plan, i.e.
          // what a consumer of the full result pays.
          // SPARK_GRAFT_PROFILE_COUNT flips back to count() semantics —
          // the diagnostic knob that separates "what the full result
          // costs" from "what a count-pruned plan costs" (column pruning
          // through the joins + eliminated final sorts/left-joins).
          val rows =
            if (sys.env.contains("SPARK_GRAFT_PROFILE_COUNT")) q(spark, dir).count()
            else q(spark, dir).queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          // listener events are posted asynchronously; drain the bus so
          // this query's tasks aren't attributed to the next one
          org.apache.spark.sql.graftbridge.ListenerBridge
            .waitUntilEmpty(spark.sparkContext)
          val rec = (n, rows, sec, mb(input.get), mb(shufWrite.get),
            mb(shufRead.get), mb(memSpill.get), mb(diskSpill.get), tasks.get)
          println(s"""{"query":"$n","rows":$rows,"sec":${math.round(sec * 100) / 100.0},""" +
            s""""input_mb":${rec._4},"shuffle_write_mb":${rec._5},""" +
            s""""shuffle_read_mb":${rec._6},"mem_spill_mb":${rec._7},""" +
            s""""disk_spill_mb":${rec._8},"tasks":${rec._9}}""")
          Some(rec)
      }
    }
    val worstSpill = out.map(r => r._7 + r._8).maxOption.getOrElse(0.0)
    println(s"""{"profile":"done","sf_dir":"$dir","queries":${out.size},""" +
      s""""total_shuffle_write_mb":${out.map(_._5).sum},""" +
      s""""worst_spill_mb":$worstSpill}""")
    spark.stop()
  }
}
