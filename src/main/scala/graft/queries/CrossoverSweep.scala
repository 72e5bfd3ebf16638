package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: bracket x28's dispatch crossover (r10 item 2 / r11 item 4).
  *
  * The adaptive dispatch ([[DedupQueries.weightedJaccardAdaptive]])
  * picks the weighted-prefix engine when the probe-volume fraction
  * Σ_probe df / Σ df falls below a cutoff. r10 set it to 0.15 between
  * two FAR measurements — 0.62 (flat-df sf1, count-everything wins 8×)
  * and 0.0005 (boilerplate spec corpus, prefix wins 1 900×) — with
  * nothing measured in between; this sweep's r12 bracketing moved it
  * to 0.08 (crossover measured ≈ 0.06 at sf0.1). This sweep builds the missing MID-regime
  * corpora — the sf flat corpus unioned with B template-sharing
  * boilerplate docs, B dialed so the template's df² mass pushes the
  * fraction down through the cutoff — and times BOTH engines at each
  * point (warm, min of `reps`, engines verified pair-for-pair equal at
  * the threshold), printing one JSON line per point for BASELINE's
  * bracketing table.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   runMain graft.queries.CrossoverSweep [B ...]   (default sweep below)
  */
object CrossoverSweep {
  private val t = 0.3

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("crossover-sweep",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SWEEP_REPS", "3").toInt
    val bs = if (args.nonEmpty) args.toSeq.map(_.toInt)
             else Seq(0, 400, 800, 1600, 2400, 3200)
    val flat = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))

    // B boilerplate docs: the WeightedPrefixScaleSpec shape (20 shared
    // template words → 19 hot df=B bigrams; 5 pair-private rare words;
    // 1 doc-private tail), ids offset out of the flat corpus's space
    def boiler(b: Int): DataFrame = {
      import spark.implicits._
      val template = (1 to 20).map(i => s"tpl$i").mkString(" ")
      (0 until b).map { i =>
        val pair = i / 2
        val rare = (1 to 5).map(k => s"rare${pair}_$k").mkString(" ")
        (10000000L + i, "en", s"$template $rare tail$i")
      }.toDF("doc_id", "lang", "text")
    }

    def wjPairs(df: DataFrame): DataFrame = df
      .withColumn("wj", graft.functions.MoneyFunctions.roundAt(
        col("wc") / (col("w_a") + col("w_b") - col("wc")), 6))
      .filter(col("wj") >= t)
      .select("doc_a", "doc_b", "common", "wj")

    bs.foreach { b =>
      val corpus = flat.unionByName(boiler(b))
      val sh = graft.corpus.Corpus.withShingles(corpus)
        .select(col("doc_id"), col("lang"), col("sh"),
          size(col("sh")).as("n"))
      val idx = DedupQueries.indexedPostings(sh).cache()
      val slack = lit(t - 1e-6 - 1e-9)
      val r = idx.filter(col("df") >= 2)
        .agg(sum("df").as("vol"),
          sum(when(col("wrem") >= slack * col("wsum"), col("df"))).as("probe"))
        .first()
      val frac = r.getLong(1).toDouble / r.getLong(0)
      def prefix() = wjPairs(DedupQueries.weightedJaccardPairs(idx, t))
      def full() = wjPairs(DedupQueries.ngramJaccardCommonFrom(
        corpus, idx, lengthFilter = false, idfWeighted = true,
        weightsOnIndex = true))
      // engines must agree before their times mean anything
      val pSet = prefix().collect().map(_.toString).toSet
      val fSet = full().collect().map(_.toString).toSet
      require(pSet == fSet, s"engines disagree at B=$b: " +
        s"only-prefix=${(pSet -- fSet).take(3)} only-full=${(fSet -- pSet).take(3)}")
      def time(body: () => DataFrame): Double =
        (0 until reps).map { _ =>
          val t0 = System.nanoTime(); body().count()
          (System.nanoTime() - t0) / 1e9
        }.min
      val (tp, tf) = (time(prefix _), time(full _))
      println(f"""{"sweep":{"b":$b,"fraction":$frac%.4f,"pairs":${pSet.size},""" +
        f""""prefix_sec":$tp%.3f,"full_sec":$tf%.3f,""" +
        s""""winner":"${if (tp < tf) "prefix" else "count-everything"}","sf_dir":"$dir"}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
