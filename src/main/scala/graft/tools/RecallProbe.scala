package graft.tools

import graft.core.Sessions

/** Dev probe: run the frame recall report at an arbitrary sample gate
  * and rule — the knob the registered m5/m7 queries pin down (40%,
  * strict/bounded). Used for the BASELINE ladder's sampling-artifact
  * check (pct=100 vs the gated number at the same scale).
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir> <pct> <strict|bounded>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pct = args(1).toInt
    val bounded = args(2) == "bounded"
    val spark = Sessions.local("recall-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.cpus))
    val t0 = System.nanoTime()
    val r = graft.queries.EventQueries
      .frameRecallReport(spark, dir, pct, bounded).collect().head
    val sec = math.round((System.nanoTime() - t0) / 1e7) / 100.0
    println(s"""{"recallprobe":{"dir":"$dir","pct":$pct,""" +
      s""""rule":"${if (bounded) "bounded" else "strict"}","sec":$sec,""" +
      s""""n_exact":${r.getLong(0)},"n_capped":${r.getLong(1)},""" +
      s""""recall":${r.getDouble(3)},"n_media":${r.getLong(6)},""" +
      s""""keeper_agreement":${r.getDouble(8)}}}""")
    spark.stop()
  }
}
