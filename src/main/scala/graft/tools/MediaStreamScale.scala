package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: the MEDIA streaming sections alone (frameDedupStream probe
  * at two index sizes + the full mediaStreamIncremental ingest loop), so
  * the r14 media loop can be measured at fixtures a full StreamBench
  * pass would take an hour on. Delegates to
  * [[StreamBench.mediaSections]] — the SAME runner the full battery
  * uses (index from odd doc_ids, stream the evens in
  * SPARK_GRAFT_STREAM_BATCHES (default 5) micro-batches) — so an sf0.1
  * row from either tool reads identically, and an sf1 row from this one
  * is the same experiment one decade up.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.MediaStreamScale
  */
object MediaStreamScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("media-stream-scale",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.core.Scratch.dir("media_stream_scale")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "5").toInt

    val docs = graft.core.Tables.documents(spark, dir)
    val evens = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("text"))
      .as[graft.streaming.StreamingOps.DocRow]
      .collect().toSeq.sortBy(_.doc_id)
    val chunk = math.max(1, evens.size / nBatches)

    val mediaJson = StreamBench.mediaSections(spark, docs, evens, chunk,
      base, "mss")
    println("{" + mediaJson + s""","sf_dir":"$dir","n_batches":$nBatches}""")
    spark.stop()
  }
}
