package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the degenerate-population contracts the r13 degencheck gate
  * established (tools/degencheck.py found all four as live cross-engine
  * divergences), so a regression is caught by `sbt test` alone without
  * the DuckDB differential run: empty text is a DEFINED fingerprint and
  * a DEFINED media row, and a zero-norm vector is deterministically
  * absent from the KNN graph.
  */
class DegenerateContractSpec extends SparkSpec {

  private lazy val docDir: String = {
    val dir = tmpDir("degen_docs")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "alpha beta gamma delta", "en", "web", 22L),
      Row(2L, "epsilon zeta eta theta", "en", "web", 22L),
      Row(99L, "", "en", "web", 0L)) // the zero-byte payload
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t4: empty text fingerprints to roll_hash 0, not an engine-dependent fold of sequence(1,0)") {
    val got = graft.SparkEntry.queries("t4_fingerprint")(spark, docDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set(1L, 2L, 99L))
    assert(got(99L) == 0L, "empty text must hash to the fold seed 0")
    assert(got(1L) != 0L && got(2L) != 0L)
  }

  test("m2: the zero-byte payload emits a defined media row (the codec pipeline is total)") {
    val got = graft.SparkEntry.queries("m2_media_features")(spark, docDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4),
          r.getInt(5), r.getLong(6)))).toMap
    assert(got.keySet == Set(1L, 2L, 99L),
      "the empty payload row must not be dropped")
    assert(got(99L) == ((0L, 0.0, 0.0, 8, 8, 0L)),
      s"zero-byte media contract violated: ${got(99L)}")
  }

  test("per-document text operators drop NULL text uniformly (the r14 degencheck class)") {
    // Spark's size(NULL) = -1 under ansi-off vs DuckDB's NULL
    // propagation diverge on every stat a NULL-text doc touches — the
    // r14 gate caught 14 queries at once. The contract: per-document
    // text operators define their domain as PRESENT text; a null-text
    // row is an ingest failure handled upstream (the same rule the
    // media adapter applies at the codec boundary).
    val dir = tmpDir("degen_nulltext")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "alpha beta gamma delta", "en", "web", 22L),
      Row(2L, "epsilon zeta eta theta", "en", "books", 22L),
      Row(98L, null, "en", "web", 0L)) // the null-text row
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("t2_quality_score", "t4_fingerprint", "t8_ngram_repetition",
        "t15_segment_dedup", "y4_pack_shards", "y10_sequence_spans",
        "f21_map_kit", "f22_regex_extract", "g1_array_kit").foreach { q =>
      val ids = graft.SparkEntry.queries(q)(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L),
        s"$q: null-text row handling diverged from the contract (got $ids)")
    }
    // aggregate-shaped members of the class: the null row contributes to
    // NO group
    val t3 = graft.SparkEntry.queries("t3_token_count")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t3 == Map("web" -> 1L, "books" -> 1L),
      s"t3 must count only present-text docs, got $t3")
    spark.catalog.clearCache()
  }

  test("x25: a zero-norm vector joins no KNN edge in either direction") {
    val dir = tmpDir("degen_vecs")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val d = 6
    def v(seed: Int): Seq[Float] =
      (0 until d).map(i => 0.1f + ((seed * 7 + i * 3) % 11) / 10.0f)
    val rows = (1L to 10L).map(i => Row(i, v(i.toInt), (i % 3).toInt)) :+
      Row(99L, Seq.fill(d)(0.0f), 7) // the zero-norm vector
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("x25_knn_graph")(spark, dir).collect()
    assert(out.nonEmpty, "no KNN edges at all — spec is vacuous")
    assert(!out.exists(r => r.getLong(0) == 99L || r.getLong(2) == 99L),
      "a zero-norm vector (cosine 0/0 — the engines disagree on NaN " +
        "ranking) leaked into the KNN graph")
    spark.catalog.clearCache()
  }

  private lazy val shortSpanEventsDir: String = {
    val dir = tmpDir("degen_events_short")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def t(d: String) = java.sql.Timestamp.valueOf(d)
    val rows = Seq(
      Row(1L, t("2024-06-01 10:00:00"), 7L, "click", 1.0, "{}"),
      Row(2L, t("2024-06-03 10:00:00"), 8L, "click", 2.0, "{}"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("w8: a corpus spanning under 7 days yields ZERO fully-covered days, not a sequence() crash") {
    // Spark's sequence() with an explicit positive step throws when
    // start > stop; the DuckDB twin's generate_series returns empty —
    // the span guard makes both engines emit no rows (r14 review find)
    val got = graft.SparkEntry.queries("w8_rolling_distinct_users")(
      spark, shortSpanEventsDir).collect()
    assert(got.isEmpty,
      s"a 3-day corpus has no fully-covered trailing-7d window, got ${got.length} rows")
  }

  test("e15: same-user same-timestamp events land in ONE session (the tie the oracle must agree on)") {
    val dir = tmpDir("degen_events_tie")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def t(d: String) = java.sql.Timestamp.valueOf(d)
    val rows = Seq(
      Row(1L, t("2024-06-01 12:00:00"), 7L, "click", 1.0, "{}"),
      Row(2L, t("2024-06-01 12:00:00"), 7L, "click", 2.0, "{}"),
      Row(3L, t("2024-06-01 14:00:00"), 7L, "click", 3.0, "{}"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("e15_session_window")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("n_events"))))
    // two tied events (gap 0) form one session; the 14:00 event (gap
    // 2 h ≥ 30 min) starts another — degencheck's tied pair pins the
    // ORACLE side of the same contract
    assert(got.sorted.toSeq == Seq(1L, 2L),
      s"expected sessions of 2 (tied pair) and 1, got ${got.toSeq}")
  }
}
