package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Dev tool: capture the PER-ROUND physical plans of the iterative graph
  * loops (CC / PageRank). The loops' returned frames are
  * checkpoint-backed, so `PlanAudit` over the final query can never show
  * the per-round join strategy — this sets `graft.debug.graphExplain`
  * (the loops then print each round's formatted plan to stderr under a
  * `[cc round N]` / `[pagerank round N]` marker) and runs the named
  * queries once.
  *
  * `SPARK_GRAFT_BUDGET` (bytes) pins `graft.verify.broadcastBudget` so a
  * before/after pair can be cut from the same build: budget 0 = the
  * no-hint regime (the pre-r16 plan), unset = the measured default.
  * Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_BUDGET=0]
  *        runMain graft.tools.GraphPlanProbe x27_pagerank [more ...]
  */
object GraphPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graph-plan-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.cpus))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("graft.debug.graphExplain", "true")
    sys.env.get("SPARK_GRAFT_BUDGET").filter(_.nonEmpty)
      .foreach(b => spark.conf.set("graft.verify.broadcastBudget", b))
    args.foreach { n =>
      System.err.println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, dir).count()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
