package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.multimodal.Multimodal

/** Dev probe: the m6 bounded-rule pair pipeline at an EXPLICIT salt
  * chunk — the A/B lever for the r15 finding the salt rung answers
  * (the rep×ev candidate join spilled 11.3 GB mem / 946 MB disk at
  * sf3, partition-raise-invariant: the working set is task-local on
  * replica-hot hashes, exactly the population per-key salting spreads).
  * Runs candidates → full-set verify → the per-media partner agg (the
  * m6 body minus the report tail), cold cache, with per-stage task
  * metrics so the spill stays attributed to its exchange — pass a
  * huge chunk (e.g. 99999999999) for nsalt = 1 ≡ the unsalted r15
  * shape, and the production default 1024 for the salted one. The
  * OUTPUT is saltChunk-invariant (FrameRecallSpec pins it); only the
  * movement may move, which is the point.
  *
  * Usage: runMain graft.tools.MediaSaltProbe <sfDir> <saltChunk>
  */
object MediaSaltProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val saltChunk = args(1).toLong
    val spark = Sessions.local("media-salt-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.cpus))
    def mb(l: Long): Double = math.round(l / 1048.576) / 1000.0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null && (m.shuffleWriteMetrics.bytesWritten > 0 ||
            m.memoryBytesSpilled > 0 || m.shuffleReadMetrics.totalBytesRead > 0)) {
          val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct
            .mkString("|")
          println(s"""{"stage":${si.stageId},"tasks":${si.numTasks},""" +
            s""""sec":${si.completionTime.flatMap(c =>
              si.submissionTime.map(s => (c - s) / 1000.0)).getOrElse(-1.0)},""" +
            s""""shuffle_write_mb":${mb(m.shuffleWriteMetrics.bytesWritten)},""" +
            s""""shuffle_read_mb":${mb(m.shuffleReadMetrics.totalBytesRead)},""" +
            s""""mem_spill_mb":${mb(m.memoryBytesSpilled)},""" +
            s""""disk_spill_mb":${mb(m.diskBytesSpilled)},""" +
            s""""scopes":"$scopes"}""")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, dir), width = 32, height = 2)
    val fh = Multimodal.frameHashes(media, everyN = Multimodal.FRAME_EVERY_N)
      .select("media_id", "fhash48").distinct().cache()
    val dfm = Multimodal.frameDf(fh).cache()
    val ev = Multimodal.truthEvidence(fh, dfm, Multimodal.FRAME_TRUTH_DF_CAP)
      .cache()
    // locate the corpus on the multiplicity axis relative to the salt
    // chunk BEFORE reading the A/B: if no hash's df exceeds the chunk,
    // nsalt = 1 everywhere and the two runs are definitionally identical
    val d = dfm.agg(coalesce(max("dfm"), lit(0L)).as("max_df"),
      count(lit(1)).as("n_hashes"),
      coalesce(sum(when(col("dfm") > saltChunk, 1L).otherwise(0L)), lit(0L))
        .as("over_chunk"),
      coalesce(sum(when(col("dfm") > Multimodal.FRAME_DF_CAP, 1L)
        .otherwise(0L)), lit(0L)).as("over_cap")).first()
    println(s"""{"df_stats":{"max_df":${d.getLong(0)},""" +
      s""""n_hashes":${d.getLong(1)},"over_chunk":${d.getLong(2)},""" +
      s""""over_cap":${d.getLong(3)}}}""")
    val rep = Multimodal.electReps(ev)
    val sets = ev.groupBy("media_id").agg(collect_set("fhash48").as("fhs"))
    // cached for the two union branches, exactly as the m6 query does
    val pairs = Multimodal.verifySetPairs(
      Multimodal.repCandidatePairs(rep, ev, dfm, saltChunk), sets,
      minShared = 2).cache()
    val agg = pairs.select(col("doc_a").as("media_id"), col("doc_b").as("nbr"))
      .union(pairs.select(col("doc_b").as("media_id"), col("doc_a").as("nbr")))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_partners"), min("nbr").as("min_nbr"))
    val rows = agg.queryExecution.toRdd.count()
    org.apache.spark.sql.graftbridge.ListenerBridge
      .waitUntilEmpty(spark.sparkContext)
    println(s"""{"mediasaltprobe":{"dir":"$dir","salt_chunk":$saltChunk,""" +
      s""""rows":$rows,""" +
      s""""sec":${math.round((System.nanoTime() - t0) / 1e7) / 100.0}}}""")
    spark.stop()
  }
}
