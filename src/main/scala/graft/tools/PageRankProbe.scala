package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Dev probe: where does x27's wall-clock go? Phases are fenced by
  * materializing actions so each number is one phase's cost:
  *   build  — distinct (order, part) items + basket self-join edge set
  *   deg    — out-degree + edge⨝degree cached build (pageRank's eDeg)
  *   rounds — the 3 iterative join-agg rounds (via Corpus.pageRank on
  *            the pre-materialized frames)
  *   sort   — the final full-node orderBy the oracle contract requires
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PageRankProbe [reps]
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = Sessions.local("pagerank-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.cpus))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val mins = scala.collection.mutable.Map.empty[String, Double]
    def rec(k: String, s: Double): Unit =
      mins(k) = math.min(mins.getOrElse(k, Double.MaxValue), s)
    for (_ <- 1 to reps) {
      spark.sharedState.cacheManager.clearCache()
      val (items, tItems) = timed {
        val it = Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_partkey").distinct().cache()
        it.count(); it
      }
      rec("items", tItems)
      val (edges, tEdges) = timed {
        val e = items.as("a").join(items.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct().cache()
        e.count(); e
      }
      rec("edges", tEdges)
      val nodes = items.select(col("l_partkey").as("id")).distinct()
      val (ranked, tRounds) = timed {
        val r = graft.corpus.Corpus.pageRank(nodes, edges, iters = 3)
        r.cache().count(); r
      }
      rec("rounds3", tRounds)
      val (_, tSort) = timed {
        // execute the PHYSICAL plan's RDD, not .count(): a count over an
        // orderBy is an Aggregate over a Sort, and Catalyst's
        // EliminateSorts removes the Sort there — the timed number would
        // be a cached-scan count, silently excluding the phase this
        // block exists to measure (r14 ADVICE).
        ranked.select(col("id").as("part"), col("rank"))
          .orderBy(col("rank").desc, col("part"))
          .queryExecution.executedPlan.execute().count()
      }
      rec("sort", tSort)
      items.unpersist(); edges.unpersist(); ranked.unpersist()
    }
    val js = mins.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",")
    // also per-round marginal: run 1 vs 3 rounds on hot frames
    println(s"""{"probe":"x27_phases","sf_dir":"$dir","reps":$reps,$js}""")
    spark.stop()
  }
}
