package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The r15 ANN-family regime dispatch
  * ([[SimilarityQueries.dispatchAssigned]]): the centroid-blocked pair
  * self-joins (x18/x25/x26) hint one side only through a MEASURED
  * byte statistic against the shared heap-derived budget — and the
  * regime choice may change the PLAN, never the ANSWER. Same contract
  * and same conf knob as VerifyRegimeSpec pins for the x4/x20 family.
  */
class AnnRegimeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val family =
    Seq("x18_semantic_dedup", "x25_knn_graph", "x26_semantic_clusters",
      "x36_semantic_dedup_scaled", "x37_semantic_clusters_scaled")

  private def withBudget[T](budget: Long)(body: => T): T = {
    spark.conf.set("graft.verify.broadcastBudget", budget.toString)
    try body
    finally {
      spark.conf.unset("graft.verify.broadcastBudget")
      spark.catalog.clearCache()
    }
  }

  private def battery(): Map[String, Seq[String]] = {
    val out = family.map { name =>
      name -> SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    }.toMap
    spark.catalog.clearCache()
    out
  }

  test("assignedFrameBytes follows the documented per-row arithmetic exactly") {
    import spark.implicits._
    // 8·len(v) + 96 per row: 3 rows with 4, 0 and 2 elements
    val f = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq.empty[Double]),
        (3L, Seq(5.0, 6.0)))
      .toDF("cand_id", "v")
    assert(SimilarityQueries.assignedFrameBytes(f) ==
      (8 * 4 + 96) + (8 * 0 + 96) + (8 * 2 + 96))
    assert(SimilarityQueries.assignedFrameBytes(f.limit(0)) == 0L,
      "an empty frame must measure 0, not null-crash")
  }

  test("x18/x25/x26 are output-equal under broadcast and natural regimes") {
    val hinted = withBudget(Long.MaxValue)(battery())
    hinted.foreach { case (n, rows) =>
      assert(rows.nonEmpty, s"$n returned no rows — the equality pin is vacuous")
    }
    assert(withBudget(0L)(battery()) == hinted,
      "the natural (zero-budget) regime changed an ANN pair-join answer")
  }

  test("the dispatch hints under an infinite budget and not under zero") {
    def analyzed(q: String): String =
      SparkEntry.queries(q)(spark, dir).queryExecution.analyzed.toString
    withBudget(Long.MaxValue) {
      // x26 is excluded from the POSITIVE check only: its pair join runs
      // upstream of the connected-components localCheckpoint, so the
      // returned frame's plan is a LogicalRDD that no longer contains
      // the join — the dispatch still governs it through the same
      // shared code path (output equality pinned above)
      Seq("x18_semantic_dedup", "x25_knn_graph",
          "x36_semantic_dedup_scaled").foreach { q =>
        assert(analyzed(q).contains("ResolvedHint"),
          s"$q: measured dispatch must hint when everything fits the budget")
      }
      spark.catalog.clearCache()
    }
    // the zero-budget side of this invariant (no ResolvedHint at all)
    // is enforced for the whole family in PlanAuditSpec's audit
  }
}
