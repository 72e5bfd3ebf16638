package graft.corpus

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The r16 graph-loop regime dispatch ([[Corpus.dispatchNodeFrame]]):
  * the iterative CC / PageRank rounds hint their node-sized frames
  * (labels / neighbor-min / pointer-jump, rank / degree / inflow)
  * through a CLOSED-FORM byte statistic (rows × UnsafeRow width —
  * the row count is already on hand in both loops) against the shared
  * heap-derived budget, so the cached O(E) edge table stays
  * un-exchanged across rounds. Same contract and same conf knob as
  * VerifyRegimeSpec / AnnRegimeSpec pin for the other measured
  * dispatches: the regime may change the PLAN, never the ANSWER.
  */
class GraphRegimeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // every family member whose tail is a graft.corpus graph loop: x27
  // (PageRank), x11 (CC over LSH pairs), x29 (incremental CC over the
  // quotient graph — exercises updateClustersWithStats' loop too)
  private val family =
    Seq("x27_pagerank", "x11_dedup_clusters", "x29_dedup_clusters_update")

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

  test("dispatchNodeFrame follows the documented closed-form bytes exactly") {
    import spark.implicits._
    val f = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    def hinted(rows: Long, budget: Long): Boolean = withBudget(budget) {
      Corpus.dispatchNodeFrame(f, rows, 2)
        .queryExecution.analyzed.toString.contains("ResolvedHint")
    }
    // 2-col rows are 8 + 2·8 = 24 bytes, charged the documented 3× hash-
    // relation multiplier (r17): 10 rows cost 720 — hint strictly under
    // 721, not at 720 (strict <, so the zero-budget knob admits nothing)
    assert(hinted(10L, 721L), "10×24×3 B must hint under a 721 B budget")
    assert(!hinted(10L, 720L), "strict <: 720 B charged at a 720 B budget")
    assert(!hinted(0L, 0L), "an empty frame must not satisfy budget 0")
  }

  test("x27/x11/x29 are output-equal under broadcast and natural regimes") {
    val hinted = withBudget(Long.MaxValue)(battery())
    hinted.foreach { case (n, rows) =>
      assert(rows.nonEmpty, s"$n returned no rows — the equality pin is vacuous")
    }
    assert(withBudget(0L)(battery()) == hinted,
      "the natural (zero-budget) regime changed a graph-loop answer")
  }

  test("pageRank converged-mode output is regime-invariant too") {
    import spark.implicits._
    // a 2-component digraph with a chain long enough for >1 round
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L,
      10L -> 11L, 11L -> 10L).toDF("src", "dst")
    val nodes = (1L to 5L).union(Seq(10L, 11L)).toDF("id")
    def run() = {
      val (r, rounds) = Corpus.pageRankConverged(nodes, edges, eps = 1e-12)
      (r.collect().map(_.toString).sorted.toSeq, rounds)
    }
    val a = withBudget(Long.MaxValue)(run())
    val b = withBudget(0L)(run())
    assert(a._1.nonEmpty && a == b,
      "converged pageRank diverged between broadcast and natural regimes")
  }
}
