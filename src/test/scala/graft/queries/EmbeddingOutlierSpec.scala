package graft.queries

import graft.SparkSpec

class EmbeddingOutlierSpec extends SparkSpec {

  test("x35 flags exactly the >=2-sigma low-cohesion members, per an independent recompute") {
    val rows = graft.SparkEntry.queries("x35_embedding_outliers")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // independent ground truth from the emitted cosines alone: exact
    // per-label mean/sample-sigma over the 6-dp scores, the same e9
    // moment formula, flags = z >= 2 (sigma-0 labels flag nothing)
    val byLabel = rows.groupBy(_._2)
    val expectFlags = byLabel.flatMap { case (_, g) =>
      val n = g.length.toDouble
      val s1 = g.map(_._3).sum
      val s2 = g.map(c => c._3 * c._3).sum
      val mu = r6(s1 / n)
      val sigma = r6(math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1.0), 0.0)))
      g.toSeq.map(r =>
        r._1 -> (sigma > 0 && r6((mu - r._3) / sigma) >= 2.0))
    }.toMap
    rows.foreach { case (id, _, _, _, flag) =>
      assert(flag === expectFlags(id), s"vec $id")
    }
    assert(rows.exists(_._5), "no outliers at this sf — spec is vacuous")
    assert(rows.count(_._5) < rows.length / 10,
      "flagging >10% of the corpus — threshold or stats are off")
    // every flagged member really is below its label's mean cohesion
    val mean = byLabel.map { case (l, g) => l -> g.map(_._3).sum / g.length }
    rows.filter(_._5).foreach { case (id, l, cos, _, _) =>
      assert(cos < mean(l), s"vec $id flagged above its label mean")
    }
  }

  test("x35 singleton label: sigma is exactly 0, z null, nothing flagged (no NaN)") {
    // nn = 1 makes the sample-variance quotient 0/0 = NaN; the engines
    // disagree on NaN downstream (Spark roundAt floors it to 0, DuckDB
    // propagates it and NaN > 0 is true there), so x35 guards the
    // degenerate group explicitly. This pins the guarded behavior on a
    // fixture the shipped testdata doesn't contain: one singleton label
    // among normal multi-member ones.
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def v(xs: Float*): Seq[Float] = xs
    val rows = Seq(
      Row(1L, v(1f, 0f, 0f), 0), Row(2L, v(0.9f, 0.1f, 0f), 0),
      Row(3L, v(0.8f, 0.2f, 0f), 0), Row(4L, v(-1f, 0f, 0f), 0),
      Row(5L, v(0f, 1f, 0f), 7)) // label 7 is a singleton
    val dir = java.nio.file.Files.createTempDirectory("x35solo").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("x35_embedding_outliers")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))))
      .toMap
    assert(out(5L) === ((None, false)), "singleton label must flag nothing, z null")
    out.values.flatMap(_._1).foreach(z => assert(!z.isNaN, "NaN z leaked"))
    graft.core.Scratch.deleteTree(java.nio.file.Paths.get(dir))
  }
}
