package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StarSchema over variant fact schemas ≙ the reference's fuzzy handling
  * (_pick_col + debit−credit amounts): the exporter must digest facts
  * that don't come from our own pipeline.
  */
class StarSchemaVariantSpec extends SparkSpec {
  import spark.implicits._

  test("fact with tx_date and debit/credit columns exports correctly") {
    val fact = Seq(
      ("2025-12-01", "ACME", "40000001", Some(100.0), None: Option[Double]),
      ("2025-12-02", "ACME", "61000001", None, Some(40.0)),
      ("2025-12-02", "GLOBEX", "40000001", Some(70.0), Some(20.0)))
      .toDF("tx_date", "entity", "account_code", "debit", "credit")
      .withColumn("tx_date", to_date(col("tx_date")))
    val coa = Seq(("40000001", "Sales", "Revenue"), ("61000001", "Wages", "Expense"))
      .toDF("account_code", "account_name", "account_type")
    val kpi = spark.emptyDataFrame

    assert(StarSchema.pickCol(fact, StarSchema.dateColCandidates).contains("tx_date"))
    val factM = fact.withColumn("date", col("tx_date"))
    val dEntity = StarSchema.dimEntity(
      factM.withColumn("entity", col("entity")),
      Seq.empty[String].toDF("entity"))
    assert(dEntity.columns.toSeq == Seq("entity_key", "entity")) // no currency col
    assert(dEntity.collect().map(_.getString(1)).toSeq == Seq("ACME", "GLOBEX"))

    val gl = StarSchema.factGl(factM, dEntity, StarSchema.dimAccount(coa))
      .orderBy("date_key", "entity_key").collect()
    assert(gl.length == 3)
    // debit - credit amounts
    assert(gl.map(_.getAs[Double]("amount")).toSeq == Seq(100.0, -40.0, 50.0))
    assert(gl.head.getAs[Int]("date_key") == 20251201)
    assert(!gl.head.schema.fieldNames.contains("description")) // absent passthrough stays absent
  }
}
