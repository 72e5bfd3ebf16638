package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-parity pins for the native `simhash(text, bits)` kernel against
  * the relational formulation it replaced (distinct-word explode →
  * bits× vote posexplode → two shuffled aggregations) — the exact
  * construction the x3/x31 DuckDB oracles still compute, so parity here
  * plus oracle green means the kernel is proven against BOTH the old
  * Spark plan and the cross-engine twin. Runs on real testdata plus the
  * adversarial edge rows (empty text, single word, consecutive spaces
  * producing empty "words", duplicate words whose votes must count
  * once, multi-byte UTF-8 through md5), in codegen AND interpreted
  * modes.
  */
class SimHashParitySpec extends SparkSpec {

  private def edgeDocs: DataFrame = {
    import spark.implicits._
    Seq(
      (1000001L, ""),
      (1000002L, "one"),
      (1000003L, "a  b"),          // double space → empty middle word
      (1000004L, "a b a b a"),     // duplicates vote once
      (1000005L, "é ü ñ 漢字 b"),  // multi-byte UTF-8 through md5
      (1000006L, "  ")             // only empty words
    ).toDF("doc_id", "text")
  }

  private def docsUnion: DataFrame =
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").unionByName(edgeDocs)

  /** the pre-native relational formulation (DedupQueries.simhash before
    * r9), kept verbatim as the parity reference.
    */
  private def sqlSimhash(df: DataFrame, bits: Int): DataFrame = {
    val words = df
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("hx", expr(s"substring(md5(w), 1, ${bits / 4})"))
    val votes = words.select(col("doc_id"), posexplode(expr(
      s"""transform(sequence(0, ${bits - 1}), j ->
        |  CASE WHEN (shiftright(instr('0123456789abcdef', substring(hx, (j div 4) + 1, 1)) - 1,
        |                        3 - (j % 4)) & 1) = 1 THEN 1 ELSE -1 END)""".stripMargin)))
      .toDF("doc_id", "j", "c")
    votes.groupBy("doc_id", "j").agg(sum("c").as("sj"))
      .withColumn("bit", when(col("sj") >= 0, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(expr(s"shiftleft(bit, ${bits - 1} - j)")).as("simhash_sql"))
  }

  test("native simhash == explode/vote-sum formulation at 16 and 48 bits, codegen and interpreted") {
    for (bits <- Seq(16, 48); wholeStage <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        // left join from the native side so a doc silently absent from
        // the relational form (it can't be — split("") = [""], every
        // doc votes — but don't let the join hide a regression) fails
        // the null check rather than vanishing from the comparison
        val diff = docsUnion.select(col("doc_id"),
            SimHash(col("text"), bits).as("simhash_native"))
          .join(sqlSimhash(docsUnion, bits), Seq("doc_id"), "left")
          .filter(col("simhash_sql").isNull ||
            col("simhash_sql") =!= col("simhash_native"))
          .collect()
        assert(diff.isEmpty,
          s"simhash divergence at bits=$bits codegen=$wholeStage: ${diff.take(3).mkString("; ")}")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null text: kernel emits NULL, the x3/x31 builds drop the doc (r10 ADVICE pin)") {
    // The kernel is nullIntolerant — NULL text yields a row with a NULL
    // hash — while the relational formulation (and the DuckDB oracle
    // CTE) explodes the word set, so a null-text doc vanishes entirely.
    // The query-side contract is the RELATIONAL semantics: the x3/x31
    // builds filter null text before hashing, so both engines agree on
    // corpora that carry nulls. Pin both halves.
    import spark.implicits._
    val withNull = Seq((1L, "a b"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kernel = withNull.select(col("doc_id"),
      SimHash(col("text"), 16).as("h")).collect()
    assert(kernel.length == 2 && kernel.exists(r => r.getLong(0) == 2L && r.isNullAt(1)),
      s"kernel null semantics changed: ${kernel.mkString(";")}")
    val filtered = withNull.filter(col("text").isNotNull)
      .select(col("doc_id"), SimHash(col("text"), 16).as("h")).collect()
    assert(filtered.length == 1 && filtered.head.getLong(0) == 1L &&
      !filtered.head.isNullAt(1),
      "the build-side filter must drop exactly the null-text doc")
  }

  test("simhash is registered for SQL with a literal-bits contract") {
    import spark.implicits._
    val r = Seq(("a b c")).toDF("t")
      .selectExpr("simhash(t, 48) AS h").head.getLong(0)
    assert(r >= 0L, "48-bit simhash must stay a positive BIGINT")
    val err = intercept[Exception] {
      Seq(("x")).toDF("t").selectExpr("simhash(t, 64)").collect()
    }
    assert(err.getMessage.contains("63"), s"expected the bits<=63 contract, got: ${err.getMessage}")
  }
}
