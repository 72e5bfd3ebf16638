package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Bounds the approximation in z3: `approx_count_distinct` (HLL++, default
  * rsd 5%) must land within 5% of the exact distinct count per group —
  * turning the driver's rows-only check into a quantified error bound.
  */
class ScaleBoundSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("z5: approx_percentile within 1% relative error of the exact quartiles") {
    val rows = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000)")
          .as("approx"),
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    val errs = rows.flatMap { r =>
      val flag = r.getString(0)
      val approx = r.getSeq[Double](1)
      val exact = r.getSeq[Double](2)
      approx.zip(exact).map { case (a, e) =>
        val rel = math.abs(a - e) / math.abs(e)
        info(f"$flag: approx=$a%.2f exact=$e%.2f rel_err=$rel%.5f")
        rel
      }
    }
    assert(errs.forall(_ <= 0.01),
      f"approx_percentile error exceeded 1%%: max ${errs.max}%.5f")
  }

  test("z8: sketch rollup is lossless (merge == direct) and within HLL error of exact") {
    // the property the pre-aggregated-cube pattern stands on: a month's
    // distinct from merged per-day sketches must equal the single-pass
    // sketch over the same stream EXACTLY (union of register states ==
    // whole-stream register state — if this drifted, stored rollups
    // would disagree with recomputation and nobody could trust either),
    // and both must sit within the lgK=12 error envelope of the truth.
    // computed here directly (the z8 query now emits oracled boolean
    // verdicts instead of the engine-internal estimates; this spec
    // keeps the quantified numbers on record)
    val ev = Tables.eventsTs(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val rows = daily.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_rollup"))
      .join(ev.groupBy("event_type").agg(
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_direct"),
        countDistinct("user_id").as("exact_users")), Seq("event_type"))
      .collect()
    assert(rows.length >= 3, "too few event types — spec is vacuous")
    rows.foreach { r =>
      val (et, exact) = (r.getString(0), r.getLong(3))
      val direct = r.getLong(2)
      val rollup = r.getLong(1)
      val rel = math.abs(rollup - exact).toDouble / exact
      info(f"$et: exact=$exact direct=$direct rollup=$rollup rel_err=$rel%.5f")
      assert(rollup == direct,
        s"$et: merged per-day sketches != single-pass sketch ($rollup vs $direct)")
      // lgK=12 ⇒ RSE ≈ 1.04/√4096 ≈ 1.6%; 3σ ≈ 5%
      assert(rel <= 0.05, f"$et: rollup error $rel%.5f exceeds 5%%")
    }
    spark.catalog.clearCache()
  }

  test("z6: bloom fp rate tracks (1 - e^{-kn/m})^k across filter sizes") {
    // the sizing law an operator uses BEFORE running anything at 100 TB
    // key counts: measured fp on non-member probes must match the
    // textbook prediction at each m, within binomial noise (4σ on the
    // probe count) plus 35% model slack (the k=2 md5-half hashes are
    // only approximately independent/uniform).
    val k = 2.0
    Seq(16384, 65536, 262144).foreach { m =>
      val (n, nProbe, fp) = ScaleQueries.bloomFpMeasured(spark, dir, m)
      val pred = math.pow(1.0 - math.exp(-k * n / m), k)
      val tol = math.max(0.35 * pred, 4.0 * math.sqrt(pred / nProbe))
      info(f"m=$m%7d n=$n nProbe=$nProbe fp=$fp%.6f predicted=$pred%.6f tol=$tol%.6f")
      assert(math.abs(fp - pred) <= tol,
        f"bloom fp at m=$m diverges from prediction: fp=$fp%.6f pred=$pred%.6f")
    }
    spark.catalog.clearCache()
  }

  test("x16: sketch-estimated source overlap within MinHash sampling error of the exact jaccard") {
    // x16's 16-position MinHash estimate vs the EXACT jaccard of each
    // source pair's bigram-shingle sets. The estimator is a 16-trial
    // binomial with p = J, so |est − J| should stay within ~4σ =
    // 4·sqrt(J(1−J)/16) (+1/16 quantization): the bound that says how
    // many positions a 100 TB triage sketch needs for a target
    // resolution. (H = 16 is a coarse triage sketch by design —
    // source pairs near the same J are NOT distinguishable; pairs an
    // order apart are, which is what the triage decision needs.)
    val est = graft.SparkEntry.queries("x16_sketch_source_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val shingleSets = graft.corpus.Corpus.withShingles(
        Tables.documents(spark, dir))
      .select(col("source"), explode(col("sh")).as("t"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, ts) => s -> ts.map(_._2).toSet }
    spark.catalog.clearCache()
    val errs = est.map { case ((a, b), e) =>
      val (sa, sb) = (shingleSets(a), shingleSets(b))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val tol = 4.0 * math.sqrt(j * (1 - j) / 16.0) + 1.0 / 16
      info(f"$a~$b: est=$e%.3f exact=$j%.3f tol=$tol%.3f")
      (math.abs(e - j), tol)
    }
    assert(errs.nonEmpty)
    errs.foreach { case (err, tol) =>
      assert(err <= tol, f"sketch estimate off by $err%.3f (tol $tol%.3f)")
    }
  }

  test("z7: count-min estimates are one-sided and overcounts respect the e·N/W tail") {
    // the CMS contract at any scale: (a) estimate ≥ exact for EVERY key
    // — deterministic, no tolerance; (b) per key, P[overcount ≥ e·N/W]
    // ≤ e^{-K} (Markov per row, min over K=4 independent rows), so
    // across all keys at most a small fraction may exceed the bound —
    // the law that sizes W for a 100 TB key stream.
    val rows = ScaleQueries.cmsUserCounts(spark, dir)
      .select("user_id", "cms_n", "exact_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val n = rows.map(_._3).sum
    val bound = math.E * n / 64.0
    val overs = rows.map { case (_, cms, exact) => (cms - exact).toDouble }
    assert(overs.forall(_ >= 0.0),
      "CMS undercounted a key — the sketch's one guarantee is broken")
    val violators = overs.count(_ > bound)
    val meanOver = overs.sum / overs.size
    info(f"keys=${rows.size} N=$n bound=e·N/W=$bound%.1f mean_overcount=$meanOver%.1f violators=$violators")
    // e^{-4} ≈ 1.8% expected violators; allow 10% before calling W mis-sized
    assert(violators <= math.max(1, rows.size / 10),
      s"$violators of ${rows.size} keys exceed the e·N/W tail bound")
    assert(meanOver <= 2.0 * n / 64.0,
      f"mean overcount $meanOver%.1f exceeds 2·N/W — collisions are not averaging out")
  }

  test("z3: approx_count_distinct within 5% of exact per l_returnflag group") {
    val rows = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("approx"),
        countDistinct("l_partkey").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    val errs = rows.map { r =>
      val (flag, approx, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rel = math.abs(approx - exact).toDouble / exact
      info(f"$flag: approx=$approx exact=$exact rel_err=$rel%.4f")
      rel
    }
    assert(errs.forall(_ <= 0.05),
      f"HLL relative error exceeded 5%%: max ${errs.max}%.4f")
  }

  test("z10: KMV estimates within 3σ of the exact distinct-shingle counts; exact branch when n < k") {
    // KMV theory (Beyer et al. 2007): with k minima the estimator's
    // relative standard error is ~1/sqrt(k-2) — k=64 → σ ≈ 12.7%, so a
    // 3σ gate is 38%. Every per-source group AND the sketch-merged
    // '__all__' row must land inside; a group with fewer than k distinct
    // shingles must return its exact count (the sketch's lossless
    // degenerate case).
    val got = graft.SparkEntry.queries("z10_kmv_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val hashes = Tables.documents(spark, dir)
      .select(col("source"), explode(graft.functions.MinHashBases(
        graft.functions.Shingles(col("text")))).as("h"))
    val exactPer = hashes.groupBy("source").agg(countDistinct("h").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = hashes.select("h").distinct().count()
    (exactPer + ("__all__" -> exactAll)).foreach { case (src, exact) =>
      val (nSketch, est) = got(src)
      if (exact < 64) {
        assert(nSketch == exact && est == exact.toDouble,
          s"$src: n=$exact < k must take the exact branch, got ($nSketch, $est)")
      } else {
        val rel = math.abs(est - exact) / exact
        info(f"$src: est=$est%.1f exact=$exact rel_err=$rel%.4f")
        assert(rel <= 0.38, f"$src: KMV error $rel%.4f exceeds 3σ (38%%)")
      }
    }
  }

  test("z11: KMV set-algebra estimates within 3σ of the exact pair overlap; degrade branch exact") {
    // estimator theory for the pair algebra: the union estimate carries
    // KMV's ~1/sqrt(k−2) relative SE (k=64 → 3σ ≈ 38%); the Jaccard
    // ratio ρ̂ = n_common/k is a binomial proportion with
    // σ = sqrt(ρ(1−ρ)/k); the intersection estimate compounds both, so
    // its gate is the SUM of the two 3σ terms. A pair whose merged
    // distinct count is under k must return every number exact.
    val got = graft.SparkEntry.queries("z11_kmv_set_ops")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val bySrc = Tables.documents(spark, dir)
      .select(col("source"), explode(graft.functions.MinHashBases(
        graft.functions.Shingles(col("text")))).as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (s0, rs) => s0 -> rs.map(_.getLong(1)).toSet }
    val srcs = bySrc.keys.toSeq.sorted
    var worstU, worstI, worstJ = 0.0
    for (a <- srcs; b <- srcs if a < b) {
      val (sa, sb) = (bySrc(a), bySrc(b))
      val exU = (sa | sb).size.toDouble
      val exI = sa.intersect(sb).size.toDouble
      val rho = exI / exU
      val (_, unionEst, interEst, jacEst) = got((a, b))
      if (exU < 64) {
        assert(unionEst == exU && interEst == exI,
          s"($a,$b): merged < k must be exact, got ($unionEst, $interEst) vs ($exU, $exI)")
      } else {
        val relU = math.abs(unionEst - exU) / exU
        val sigJ = 3 * math.sqrt(rho * (1 - rho) / 64) + 1.0 / 64
        val relI = if (exI > 0) math.abs(interEst - exI) / exI else 0.0
        worstU = worstU max relU; worstJ = worstJ max math.abs(jacEst - rho)
        assert(relU <= 0.38, f"($a,$b): union rel err $relU%.4f > 3σ (38%%)")
        assert(math.abs(jacEst - rho) <= sigJ,
          f"($a,$b): jaccard abs err ${math.abs(jacEst - rho)}%.4f > $sigJ%.4f")
        if (exI > 0) {
          worstI = worstI max relI
          assert(relI <= 0.38 + sigJ / rho,
            f"($a,$b): intersection rel err $relI%.4f > ${0.38 + sigJ / rho}%.4f")
        }
      }
    }
    info(f"pairs=${got.size} worst rel err: union=$worstU%.4f inter=$worstI%.4f jaccard(abs)=$worstJ%.4f")
    assert(got.size == srcs.combinations(2).size)
  }

  test("t17: the trained token estimator generalizes (held-out R² ≥ 0.95) and is near-unbiased on train") {
    // the correctness oracle proves train→predict is hash-exact; this
    // pins that the closed-form solve produces a MODEL: the R² gate
    // runs on the HELD-OUT test slice the training sums never saw
    // (tokens are genuinely predictable from byte length on any text
    // corpus, so a collapse here means the normal equations regressed),
    // and OLS-with-intercept unbiasedness is asserted on the train
    // slice where it holds by construction
    val rows = graft.SparkEntry.queries("t17_token_estimator_train")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2).toDouble, r.getDouble(4)))
    def r2Of(split: String): (Int, Double) = {
      val s = rows.filter(_._1 == split)
      val ybar = s.map(_._2).sum / s.length
      (s.length, 1.0 - s.map(t => t._3 * t._3).sum /
        s.map(t => (t._2 - ybar) * (t._2 - ybar)).sum)
    }
    val (nTest, r2Test) = r2Of("test")
    val train = rows.filter(_._1 == "train")
    val meanResid = train.map(_._3).sum / train.length
    info(f"test n=$nTest heldout_R²=$r2Test%.4f train mean_resid=$meanResid%.4f")
    assert(nTest > 0, "empty test slice — the split gate broke")
    assert(r2Test >= 0.95, f"held-out R² collapsed: $r2Test%.4f")
    assert(math.abs(meanResid) <= 0.5,
      f"OLS with intercept must be near-unbiased on train, got $meanResid%.4f")
  }

  test("t16: stupid backoff never fires on the training slice; off-slice OOV bigrams score below seen ones") {
    // The backoff contract: every bigram of a lang='en' doc is in the
    // en-trained count tables by construction → backoff_fraction 0 and
    // a finite avg_logscore; and since the score of a backed-off bigram
    // is 0.4·unigram (strictly below any seen-bigram MLE of the same
    // context in expectation), docs that do back off must carry
    // higher perplexity than the en median — the quality-filter signal
    // the operator exists for.
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    val got = graft.SparkEntry.queries("t16_stupid_backoff")(spark, dir)
      .join(docs, Seq("doc_id"))
    val en = got.filter(col("lang") === "en")
    assert(en.count() > 0)
    assert(en.filter(col("backoff_fraction") =!= 0.0).count() == 0,
      "a lang='en' doc backed off — its bigrams are all in the training slice")
    val backed = got.filter(col("backoff_fraction") > 0.0)
    if (backed.count() > 0) {
      val enMedianPpl = en.stat.approxQuantile("ppl", Array(0.5), 0.0).head
      val backedAvg = backed.agg(avg("ppl")).head.getDouble(0)
      info(f"en median ppl=$enMedianPpl%.2f, backed-off docs avg ppl=$backedAvg%.2f")
      assert(backedAvg > enMedianPpl,
        "docs that back off should score worse (higher ppl) than the en median")
    }
  }

  test("t18: BPE merge counts are non-increasing across rounds and merges chain greedily") {
    // The BPE invariant the iterative trainer must respect: round k+1's
    // winning pair count can never exceed round k's, because any pair
    // present after a merge either existed before it (count ≤ the prior
    // max by the argmax) or contains the merged symbol (count ≤ the
    // merged pair's own count = the prior max). A violation means the
    // merge step corrupted the symbol stream (e.g. a mid-symbol string
    // match). Also pins that the trainer actually CHAINS: some round's
    // winner must consume an earlier round's merged symbol — the
    // difference between iterative BPE and t12 run K times.
    val merges = graft.SparkEntry.queries("t18_bpe_train")(spark, dir)
      .orderBy("round").collect()
    assert(merges.length == 6, s"expected 6 merge rounds, got ${merges.length}")
    val ns = merges.map(_.getLong(4))
    ns.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"merge count increased across rounds: $a -> $b")
    }
    val mergedSyms = merges.map(_.getString(3))
    val chains = merges.exists { r =>
      val (l, rr) = (r.getString(1), r.getString(2))
      mergedSyms.takeWhile(_ != r.getString(3)).exists(m => m == l || m == rr)
    }
    assert(chains, "no round consumed an earlier merged symbol — trainer is not iterating")
    merges.foreach(r => info(s"round ${r.getLong(0)}: '${r.getString(1)}'+'${r.getString(2)}' -> '${r.getString(3)}' (n=${r.getLong(4)})"))
  }

  test("t19: BPE encode conserves merge mass and bounds every doc in [tokens, chars]") {
    // Ties t18 (train) and t19 (encode) together arithmetically. Per
    // doc: n_ws_tokens must equal the independent whitespace-token
    // count, and n_bpe must land in [n_ws_tokens, non-space chars] —
    // every token is at least one symbol, and no merge can create
    // symbols. Corpus-wide: encoding a len ≥ 2 token walks the IDENTICAL
    // replace sequence as the training stream, so the total symbols
    // saved (Σchars − Σn_bpe) is exactly the number of replacements
    // training performed — positive (the merges fired) and bounded by
    // Σ_k n_k (round k's pair count tallies overlapping pairs, while
    // leftmost non-overlapping replace merges at most that many).
    val enc = graft.SparkEntry.queries("t19_bpe_encode")(spark, dir).collect()
    val mergeMass = graft.SparkEntry.queries("t18_bpe_train")(spark, dir)
      .agg(sum("n")).collect()(0).getLong(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "length(replace(text, ' ', '')) AS chars",
        "size(filter(split(text, ' '), t -> length(t) >= 1)) AS toks")
      .collect().map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getInt(2).toLong)).toMap
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (chars, toks) = docs(r.getLong(0))
      assert(r.getLong(1) == toks,
        s"doc ${r.getLong(0)}: n_ws_tokens ${r.getLong(1)} != independent count $toks")
      assert(r.getLong(2) >= toks && r.getLong(2) <= chars,
        s"doc ${r.getLong(0)}: n_bpe ${r.getLong(2)} outside [$toks, $chars]")
    }
    val totalChars = enc.map(r => docs(r.getLong(0))._1).sum
    val totalBpe = enc.map(_.getLong(2)).sum
    val saved = totalChars - totalBpe
    info(s"corpus: $totalChars chars -> $totalBpe BPE symbols (saved $saved, merge mass $mergeMass)")
    assert(saved > 0, "six merge rounds saved zero symbols — encode is not applying the merges")
    assert(saved <= mergeMass,
      s"saved $saved symbols but training only counted $mergeMass pair occurrences")
  }

  test("t18/t19: a corpus that runs dry before K rounds stops training and still encodes") {
    // r10 self-review: every doc 'ab ab' dries the pair supply after
    // round 1 (one merge collapses every word to a single symbol). The
    // trainer must STOP there — not crossJoin an empty winner into the
    // stream — and the encoder must treat missing rounds as identity,
    // not annihilate the vocab (which silently returned ZERO rows for
    // the whole corpus; the DuckDB twin collapsed identically, so the
    // hash compare was blind to the loss).
    import spark.implicits._
    val dryDir = graft.core.Scratch.dir("bpe_dry_corpus")
    (1L to 4L).map(i => (i, "ab ab", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dryDir/documents.parquet")
    val merges = graft.SparkEntry.queries("t18_bpe_train")(spark, dryDir).collect()
    assert(merges.length == 1,
      s"expected training to stop after the single possible merge, got ${merges.length} rounds")
    assert(merges(0).getString(1) == "a" && merges(0).getString(2) == "b",
      s"round 1 should merge a+b, got ${merges(0)}")
    val enc = graft.SparkEntry.queries("t19_bpe_encode")(spark, dryDir)
      .orderBy("doc_id").collect()
    assert(enc.length == 4, s"encode must cover all 4 docs, got ${enc.length}")
    enc.foreach { r =>
      assert(r.getLong(1) == 2L && r.getLong(2) == 2L,
        s"doc ${r.getLong(0)}: expected 2 ws tokens / 2 BPE symbols ('ab' merged), got $r")
    }
  }

  test("z3/z5/z8: the approx-only bench shape stays consistent with the verified shape") {
    // r13 ADVICE gate: Bench times the production approx path
    // (graft.bench.approxOnly=true) while Verify pins the self-verifying
    // twin shape. The two must describe the same population — same
    // groups, same exact side-counts, and the gated estimates must sit
    // inside the envelope the verified shape's verdicts certify.
    val d = "/root/testdata/sf0.001"
    def q(name: String) = graft.SparkEntry.queries(name)(spark, d)
    val (z3v, z5v, z8v) = (q("z3_approx_count_distinct").collect(),
      q("z5_approx_percentiles").collect(), q("z8_hll_sketch_rollup").collect())
    spark.conf.set("graft.bench.approxOnly", "true")
    try {
      val z3a = q("z3_approx_count_distinct").collect()
      assert(z3a.map(_.getString(0)).toSeq == z3v.map(_.getString(0)).toSeq)
      assert(z3a.map(r => r.getString(0) -> r.getLong(2)).toMap ==
        z3v.map(r => r.getString(0) -> r.getLong(1)).toMap, "row counts diverged")
      z3a.foreach { r =>
        val exact = z3v.find(_.getString(0) == r.getString(0)).get.getLong(2)
        assert(math.abs(r.getLong(1) - exact).toDouble / exact <= 0.15,
          s"${r.getString(0)}: gated approx ${r.getLong(1)} outside 3rsd of $exact")
      }
      val z5a = q("z5_approx_percentiles").collect()
      assert(z5a.map(_.getString(0)).toSeq == z5v.map(_.getString(0)).toSeq)
      assert(z5a.forall(_.getString(1).split("\\|").length == 3),
        "approx_quartiles must carry 3 values per group")
      val z8a = q("z8_hll_sketch_rollup").collect()
      assert(z8a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        z8v.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq,
        "(event_type, n_days, n_events) diverged between shapes")
      z8a.foreach { r =>
        val exact = z8v.find(_.getString(0) == r.getString(0)).get.getLong(3)
        val est = r.getLong(3)
        assert(math.abs(est - exact).toDouble / exact <= 0.05,
          s"${r.getString(0)}: gated rollup $est outside 5% of $exact")
      }
    } finally {
      spark.conf.unset("graft.bench.approxOnly")
      spark.catalog.clearCache()
    }
  }
}
