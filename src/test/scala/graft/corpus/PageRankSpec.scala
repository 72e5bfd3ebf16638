package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus.pageRank pinned against hand-computed iterations on graphs
  * small enough to do on paper. x27's DuckDB oracle pins the operator
  * against a second engine at corpus scale; this spec pins the FORMULA
  * (damping, dangling-mass leak, no-in-edge floor, per-round rounding)
  * where a wrong constant would be invisible to a twin that repeats the
  * same mistake.
  */
class PageRankSpec extends SparkSpec {

  private def grid(x: Double): Double = math.floor(x * 1e10 + 0.5) / 1e10

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Double] = {
    import spark.implicits._
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    Corpus.pageRank(n, e, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("one iteration on a directed triangle reproduces the formula by hand") {
    // 1→2, 2→3, 3→1: every node has out-degree 1 and exactly one
    // in-edge, so rank stays at the uniform fixed point forever.
    val r = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 3)
    val expected = grid((1.0 - 0.85) / 3 + 0.85 * grid(1.0 / 3))
    assert(r.values.forall(_ == expected), s"got $r expected all $expected")
  }

  test("star graph: hub collects damped mass, leaves sit at the no-in-edge floor") {
    // 2→1, 3→1, 4→1. Leaves have no in-edges → floor (1−d)/N each
    // round; the hub gets d·(3 leaves · rank/1) on top of the floor.
    // The hub's own mass is dangling (no out-edge) and leaks — the
    // documented simplification.
    val r = ranksOf(Seq(1L, 2L, 3L, 4L), Seq((2L, 1L), (3L, 1L), (4L, 1L)), iters = 2)
    val base = (1.0 - 0.85) / 4
    val r0 = grid(1.0 / 4)
    val leaf1 = grid(base) // one round: no inflow
    val hub1 = grid(base + 0.85 * (3 * (r0 / 1)))
    val hub2 = grid(base + 0.85 * (3 * (leaf1 / 1)))
    assert(r(2L) == leaf1 && r(3L) == leaf1 && r(4L) == leaf1)
    assert(r(1L) == hub2, s"hub got ${r(1L)} expected $hub2 (after $hub1)")
  }

  test("convergence mode stops when the graph stops moving, at the fixed point") {
    import spark.implicits._
    // triangle: uniform IS the fixed point, so round 1 measures zero
    // movement and the loop exits immediately
    val (triRanks, triRounds) = Corpus.pageRankConverged(
      Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
    assert(triRounds == 1, s"uniform fixed point should converge in 1 round, took $triRounds")
    val expected = grid((1.0 - 0.85) / 3 + 0.85 * grid(1.0 / 3))
    assert(triRanks.collect().forall(_.getDouble(1) == expected))

    // star: leaves settle after round 1, the hub one round later, zero
    // movement detected the round after that
    val (starRanks, starRounds) = Corpus.pageRankConverged(
      Seq(1L, 2L, 3L, 4L).toDF("id"),
      Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst"))
    assert(starRounds == 3, s"star should be still by round 3, took $starRounds")
    // converged result == the fixed-horizon run at the same depth
    val fixed = Corpus.pageRank(Seq(1L, 2L, 3L, 4L).toDF("id"),
        Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst"), iters = starRounds)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(starRanks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap == fixed)
  }

  test("ranks are a probability-like measure: positive, bounded, more in-links ⇒ more rank") {
    // 4 nodes: 1 and 2 point at 3; only 1 points at 4; symmetric back-links
    // keep everything non-dangling.
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (3L, 1L), (4L, 2L))
    val r = ranksOf(Seq(1L, 2L, 3L, 4L), edges, iters = 5)
    assert(r.values.forall(v => v > 0 && v < 1))
    assert(r(3L) > r(4L), s"two in-links should outrank one: $r")
  }
}
