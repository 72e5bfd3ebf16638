package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Quantifies the quality the approximate ANN paths trade for speed:
  * recall@3 of the LSH-bucketed (x7) and IVF (x8) searches against the
  * exact brute-force top-3 (x6) on the sf0.01 embeddings. The numbers
  * are printed so the trade-off is on the record in the test log.
  */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** query_id → top-k cand_ids (rank ≤ k). */
  private def topk(name: String, k: Int): Map[Long, Set[Long]] =
    topkOf(SparkEntry.queries(name)(spark, dir), k)

  private def topkOf(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] =
    df.select("query_id", "cand_id", "rank").collect()
      .filter(_.getInt(2) <= k)
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallAt3(approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val hits = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size
    }.sum
    hits.toDouble / (3 * exact.size)
  }

  test("ANN recall@3 vs brute force is on the record and above floor") {
    val exact = topk("x6_ann_bruteforce_topk", 3)
    val lsh = topk("x7_ann_lsh_bucketed", 3)
    val ivf = topk("x8_ann_ivf", 3)
    val pq = topk("x15_ann_pq_adc", 3)
    val ivfpq = topk("x19_ann_ivf_pq", 3)
    val ivfpqScaled = topk("x38_ann_ivf_pq_scaled", 3)
    // the scaled serving point's cost axis next to the fixed one: ADC
    // candidates per query, as a corpus fraction — the number that is
    // constant (~1/4) for (k=8, nprobe=2) at EVERY corpus size and
    // ~1/√k for (⌈√n⌉, ⌈√k⌉), shrinking as the corpus grows
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val fracFixed = SimilarityQueries.ivfPqScanned(spark, dir, 2)
      .toDouble / (10.0 * (n - 1))
    val fracScaled = SimilarityQueries.ivfPqScannedScaled(spark, dir)
      .toDouble / (10.0 * (n - 1))
    spark.catalog.clearCache()
    val rLsh = recallAt3(lsh, exact)
    val rIvf = recallAt3(ivf, exact)
    val rPq = recallAt3(pq, exact)
    val rIvfPq = recallAt3(ivfpq, exact)
    val rScaled = recallAt3(ivfpqScaled, exact)
    info(f"recall@3 x7 (multi-probe LSH, 4 planes, Hamming-1 probes): $rLsh%.3f")
    info(f"recall@3 x8 (IVF, K=8 Lloyd-trained, nprobe=2):           $rIvf%.3f")
    info(f"recall@3 x15 (PQ-ADC over 4-byte codes):                  $rPq%.3f")
    info(f"recall@3 x19 (IVF-PQ: ADC shortlist + exact refine):      $rIvfPq%.3f (ADC-scans ${fracFixed * 100}%.1f%%)")
    info(f"recall@3 x38 (IVF-PQ, k=⌈√n⌉, nprobe=⌈√k⌉):               $rScaled%.3f (ADC-scans ${fracScaled * 100}%.1f%%)")
    println(f"ANN RECALL@3: lsh=$rLsh%.3f ivf=$rIvf%.3f pq=$rPq%.3f ivfpq=$rIvfPq%.3f ivfpq_scaled=$rScaled%.3f@${fracScaled * 100}%.0f%% (fixed@${fracFixed * 100}%.0f%%)")
    // floors: the structures must beat random bucketing by a wide margin
    // (16 buckets ⇒ random recall ~1/16; 8 lists × nprobe 2 ⇒ ~1/4).
    // Measured on this corpus: single-probe LSH 0.167 → multi-probe
    // 0.433; untrained IVF 0.833 → Lloyd-trained 0.900; PQ-ADC 0.300
    // from 64×-compressed codes (K=4 codebooks scored 0.033 — the
    // fidelity cliff x14's MSE quantifies; K=16 is the usable point).
    assert(rLsh >= 0.3, f"LSH recall collapsed: $rLsh%.3f")
    assert(rIvf >= 0.6, f"IVF recall collapsed: $rIvf%.3f")
    assert(rPq >= 0.15, f"PQ-ADC recall collapsed: $rPq%.3f")
    // with the exact-vector refine over the 30-wide ADC shortlist,
    // IVF-PQ's recall ceiling is x8's (same probed lists, exact scores
    // for anything ADC ranks into the shortlist): 0.267 ADC-only →
    // refined into the x8 class.
    assert(rIvfPq >= 0.6, f"IVF-PQ refined recall collapsed: $rIvfPq%.3f")
    // the scaled point must hold the same trained-quantizer class while
    // probing ⌈√k⌉ of its ⌈√n⌉ lists — at this sf that is a comparable
    // corpus fraction to fixed (so recall should be comparable too);
    // the separation the constants buy shows at the DECADES, where the
    // scaled fraction keeps falling (AnnScaleProbe's serving rows)
    assert(rScaled >= 0.6, f"scaled IVF-PQ recall collapsed: $rScaled%.3f")
  }

  test("LSH recall@3 vs (hyperplanes, probe radius): x7's config is a measured point on the record") {
    // the recall/cost grid behind x7's constants. Each cell: recall@3
    // against brute force, and the scanned-corpus fraction (candidates
    // exactly scored / queries×(N−1)) — the cost axis. Radius 0 is
    // single-probe; radius = planes is brute force by construction.
    val exact = topk("x6_ann_bruteforce_topk", 3)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val grid = for {
      planes <- Seq(3, 4, 5, 6)
      radius <- Seq(0, 1, 2)
    } yield {
      val r = recallAt3(topkOf(SimilarityQueries.lshSearch(spark, dir, planes, radius), 3), exact)
      val frac = SimilarityQueries.lshScanned(spark, dir, planes, radius)
        .toDouble / (10.0 * (n - 1))
      spark.catalog.clearCache()
      ((planes, radius), (r, frac))
    }
    grid.foreach { case ((p, rad), (r, frac)) =>
      info(f"recall@3 LSH planes=$p radius=$rad: $r%.3f (scans ${frac * 100}%.1f%% of corpus)")
    }
    println("LSH RECALL@3 GRID: " + grid.map { case ((p, rad), (r, frac)) =>
      f"p$p/r$rad=$r%.3f@${frac * 100}%.0f%%"
    }.mkString(" "))
    val m = grid.toMap
    // sanity: the x7 production cell matches what x7 itself serves
    val x7 = recallAt3(topk("x7_ann_lsh_bucketed", 3), exact)
    spark.catalog.clearCache()
    assert(math.abs(m((4, 1))._1 - x7) < 1e-9,
      f"grid cell (4,1)=${m((4, 1))._1}%.3f disagrees with live x7=$x7%.3f")
    // recall must be monotone in radius at fixed planes (more probes can
    // only add candidates) — a violation means the probe set is broken
    Seq(3, 4, 5, 6).foreach { p =>
      assert(m((p, 0))._1 <= m((p, 1))._1 + 1e-9 &&
        m((p, 1))._1 <= m((p, 2))._1 + 1e-9, s"recall not monotone in radius at planes=$p")
    }
    // why x7 STAYS at (4 planes, radius 1) despite recall 0.433: on this
    // corpus no LSH cell reaches recall 0.6 without scanning ~half the
    // corpus (measured: 0.567@51%, 0.667@50%, 0.800@69%, 0.900@87%) —
    // brute-force territory — while the trained IVF (x8) serves 0.900
    // probing 2 of 8 lists. Sign-random-hyperplane LSH just trades
    // scan fraction for recall near-linearly here; x7's value is the
    // bucket equi-join SHAPE at scale, and (4,1) is the low-cost point.
    // If the data ever admits a cheap ≥0.6 cell, this assertion fires:
    // move x7's constants to that cell instead of keeping (4,1).
    grid.filter(_._2._1 >= 0.6).foreach { case ((p, rad), (r, frac)) =>
      assert(frac >= 0.45,
        f"planes=$p radius=$rad reaches $r%.3f at ${frac * 100}%.0f%% scan — a cheap ≥0.6 config exists; move x7 there")
    }
  }

  test("IVF-PQ recall@3 vs (nprobe, refine width): x19's operating curve is on the record") {
    // the recall/cost surface behind x19's production constants
    // (nprobe=2, REFINE_R). Axes: nprobe = coarse lists probed per
    // query (cost: ADC-scored corpus fraction, counted exactly);
    // refineR = ADC shortlist width re-ranked with exact vectors
    // (cost: queries×R exact dots). nprobe=4 of K=8 lists scans half
    // the corpus — the brute-force end of the dial.
    val exact = topk("x6_ann_bruteforce_topk", 3)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // the scanned fraction depends only on nprobe — 4 count jobs, not
    // one per grid cell
    val fracs = Seq(1, 2, 3, 4).map { nprobe =>
      nprobe -> SimilarityQueries.ivfPqScanned(spark, dir, nprobe)
        .toDouble / (10.0 * (n - 1))
    }.toMap
    val grid = for {
      nprobe <- Seq(1, 2, 3, 4)
      r <- Seq(10, 30, 50)
    } yield {
      val rec = recallAt3(topkOf(SimilarityQueries.ivfPqSearch(spark, dir, nprobe, r), 3), exact)
      spark.catalog.clearCache()
      ((nprobe, r), (rec, fracs(nprobe)))
    }
    grid.foreach { case ((np, r), (rec, frac)) =>
      info(f"recall@3 IVF-PQ nprobe=$np refineR=$r: $rec%.3f (ADC-scans ${frac * 100}%.1f%% of corpus)")
    }
    println("IVFPQ RECALL@3 GRID: " + grid.map { case ((np, r), (rec, frac)) =>
      f"np$np/R$r=$rec%.3f@${frac * 100}%.0f%%"
    }.mkString(" "))
    val m = grid.toMap
    // the production cell must match what x19 itself serves
    val x19 = recallAt3(topk("x19_ann_ivf_pq", 3), exact)
    spark.catalog.clearCache()
    assert(math.abs(m((2, SimilarityQueries.REFINE_R))._1 - x19) < 1e-9,
      f"grid cell (2,${SimilarityQueries.REFINE_R})=${m((2, SimilarityQueries.REFINE_R))._1}%.3f disagrees with live x19=$x19%.3f")
    // recall monotone in refineR at fixed nprobe — GUARANTEED, not a
    // fixture accident: the candidate set is fixed, the ADC ranking is
    // deterministic (tiebreak by cand_id), so top-10 ⊂ top-30 ⊂ top-50,
    // and under EXACT re-ranking any candidate that displaces a true
    // top-3 neighbor has a higher exact cosine — making it a true top-3
    // neighbor itself. So recall = min(3, |truth ∩ shortlist|)/3,
    // monotone in shortlist growth.
    Seq(1, 2, 3, 4).foreach { np =>
      assert(m((np, 10))._1 <= m((np, 30))._1 + 1e-9 &&
        m((np, 30))._1 <= m((np, 50))._1 + 1e-9,
        s"recall not monotone in refineR at nprobe=$np")
    }
    // monotone-in-nprobe is NOT guaranteed (r10 self-review): extra
    // probed lists grow the CANDIDATE set, but the R-wide ADC shortlist
    // is lossy-ranked, so new candidates can displace true neighbors
    // out of it — the grid's own R=10 column shows exactly that
    // (nprobe 3 → 4 drops recall). Observed, not asserted:
    Seq((1, 2), (2, 3), (3, 4)).foreach { case (a, b) =>
      if (m((a, 50))._1 > m((b, 50))._1 + 1e-9)
        info(f"ADC displacement visible: recall@R=50 fell ${m((a, 50))._1}%.3f -> ${m((b, 50))._1}%.3f between nprobe $a and $b")
    }
    // the production floor: the chosen default must hold its class
    assert(m((2, SimilarityQueries.REFINE_R))._1 >= 0.6,
      "x19's production cell fell out of the trained-quantizer class")
  }

  test("IVF recall@3 vs Lloyd training depth: LLOYD_ITERS sits at the knee") {
    // the training-honesty record: recall per unrolled Lloyd round
    // (0 = raw first-8-vectors seed). The production setting (2, the
    // constant behind x8/x18/x19 and their oracle CTE chains) must be
    // at or past the knee — more rounds must not buy meaningfully more
    // recall, or the constant is undertrained.
    val exact = topk("x6_ann_bruteforce_topk", 3)
    val byDepth = Seq(0, 1, 2, 3).map { it =>
      val r = recallAt3(topkOf(SimilarityQueries.ivfSearch(spark, dir, it), 3), exact)
      spark.catalog.clearCache()
      it -> r
    }
    byDepth.foreach { case (it, r) =>
      info(f"recall@3 IVF at LLOYD_ITERS=$it: $r%.3f")
    }
    println("IVF RECALL@3 BY LLOYD_ITERS: " +
      byDepth.map { case (it, r) => f"$it=$r%.3f" }.mkString(" "))
    val m = byDepth.toMap
    assert(m(2) >= 0.6, f"trained IVF recall collapsed: ${m(2)}%.3f")
    assert(m(3) <= m(2) + 0.1,
      f"a third Lloyd round buys ${m(3) - m(2)}%.3f recall — LLOYD_ITERS=2 is undertrained")
  }
}
