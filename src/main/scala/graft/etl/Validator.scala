package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Dq._

/** Lazy-collect validation ≙ reference quality.validate_or_collect
  * (quality.py:98–115): run ALL checks, emit a normalized exceptions
  * frame, never filter data rows (the pipeline proceeds on the raw frame
  * and the gate decides).
  *
  * Contract notes (SURVEY §7.4):
  *  - `index` is the row's rank (0-based) in the table's natural-key
  *    order, not a pandas file index — deterministic under any
  *    partitioning;
  *  - dtype checks mirror pandera coerce=True by validating the raw
  *    string against the target type (the all-strings read happens in
  *    [[EtlIO.readCsvRaw]]);
  *  - strict=True column-set enforcement compares the actual CSV header
  *    (driver-side) against the contract.
  */
object Validator {

  import Dq.rawCol

  /** full deterministic ordering: natural keys first, then every other
    * contract column as tiebreak — duplicate-natural-key rows (the very
    * case dupKeys reports) still index stably.
    */
  private def indexOrder(table: TableSchema): Seq[org.apache.spark.sql.Column] =
    (table.orderKeys ++
      table.schema.fieldNames.filterNot(table.orderKeys.contains)).map(col)

  /** 0-based rank of each row in `order`, computed scalably and entirely
    * inside the DataFrame plan (stays lazy, codegen'd, prunable): range
    * partition on the order keys, rank WITHIN each partition (a
    * partition-local window — every executor sorts only its slice), then
    * add each partition's starting offset, computed as a cumulative sum
    * over the tiny per-partition-count aggregate (rows = #partitions) and
    * broadcast-joined back. NOT a row_number over a global un-partitioned
    * Window, which would drag the whole table through a single task; the
    * range exchange is materialized once and reused by both branches.
    */
  private def withGlobalIndex(df: DataFrame,
      order: Seq[org.apache.spark.sql.Column], name: String): DataFrame = {
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("__gidx_pid", spark_partition_id())
    val local = ranged.withColumn("__gidx_local",
      row_number().over(
        Window.partitionBy("__gidx_pid").orderBy(order: _*)).cast("long") - 1)
    val offsets = ranged.groupBy("__gidx_pid").agg(count(lit(1)).as("__gidx_n"))
      .withColumn("__gidx_off", coalesce(
        sum("__gidx_n").over(Window.orderBy("__gidx_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__gidx_pid", "__gidx_off")
    local.join(broadcast(offsets), Seq("__gidx_pid"))
      .withColumn(name, col("__gidx_off") + col("__gidx_local"))
      .drop("__gidx_pid", "__gidx_local", "__gidx_off")
  }

  /** typed view of an all-strings frame + per-column raw copies + the
    * deterministic row index.
    */
  def coerce(raw: DataFrame, table: TableSchema): DataFrame = {
    val withRaw = table.schema.fields.foldLeft(raw) { (df, f) =>
      df.withColumn(rawCol(f.name), col(f.name))
        .withColumn(f.name, col(f.name).cast(f.dataType))
    }
    withGlobalIndex(withRaw, indexOrder(table), "__idx")
  }

  /** all exception rows for one table (dataset, index, column, check,
    * failure_case, schema_context, check_number).
    */
  def exceptions(
      spark: SparkSession,
      raw: DataFrame,
      table: TableSchema,
      actualColumns: Option[Seq[String]] = None): DataFrame =
    exceptionsFromCoerced(spark, coerce(raw, table), table, actualColumns)

  /** same, over an already-[[coerce]]d (and possibly cached) frame — the
    * pipeline uses this so validation and the fact build share one scan.
    */
  def exceptionsFromCoerced(
      spark: SparkSession,
      typed: DataFrame,
      table: TableSchema,
      actualColumns: Option[Seq[String]] = None): DataFrame = {

    // ALL column checks evaluate in ONE pass (SURVEY §2.9 V1): a per-row
    // array of fired-check structs, exploded and null-filtered. One scan
    // and one small plan per table instead of one filter branch per check
    // — with ~12 checks × 5 tables the per-branch plan was dominated by
    // Catalyst analysis time, not data.
    val colExceptions: Seq[DataFrame] = if (table.columnChecks.isEmpty) Nil else {
      val fired = table.columnChecks.map { ck =>
        val failureCase = ck.name match {
          case n if n.startsWith("dtype") => col(rawCol(ck.column))
          case _ => coalesce(col(ck.column).cast("string"), col(rawCol(ck.column)))
        }
        when(ck.violation, struct(
          lit(ck.column).as("column"),
          lit(ck.name).as("check"),
          failureCase.as("failure_case"),
          lit(ck.checkNo.map(Integer.valueOf).orNull).cast("int").as("check_number")))
      }
      Seq(typed
        .select(col("__idx"), explode(array(fired: _*)).as("ck"))
        .filter(col("ck").isNotNull)
        .select(
          col("__idx").as("index"),
          col("ck.column").as("column"),
          col("ck.check").as("check"),
          col("ck.failure_case").as("failure_case"),
          lit("Column").as("schema_context"),
          col("ck.check_number").as("check_number")))
    }

    val frameExceptions = table.frameChecks.map(_.exceptions(typed))

    // strict=True header enforcement (driver-side, quality.py:29 etc.)
    val headerExceptions = actualColumns.toSeq.flatMap { actual =>
      val expected = table.schema.fieldNames.toSeq
      val extra = actual.filterNot(expected.contains)
        .map(c => (c, "column_in_schema", s"unexpected column '$c'"))
      val missing = expected.filterNot(actual.contains)
        .map(c => (c, "column_required", s"missing column '$c'"))
      (extra ++ missing).map { case (c, check, msg) =>
        import spark.implicits._
        Seq((c, check, msg)).toDF("column", "check", "failure_case")
          .select(
            lit(null).cast("long").as("index"),
            col("column"), col("check"), col("failure_case"),
            lit("DataFrameSchema").as("schema_context"),
            lit(null).cast("int").as("check_number"))
      }
    }

    val all = colExceptions ++ frameExceptions ++ headerExceptions
    val unioned = all.reduceOption(_.unionByName(_))
      .getOrElse(Dq.emptyExceptions(spark).drop("severity", "dataset"))
    unioned.select(lit(table.name).as("dataset"),
      col("index"), col("column"), col("check"), col("failure_case"),
      col("schema_context"), col("check_number"))
  }

  /** referential-integrity exception generator ≙ pipeline._dq_account_in_coa
    * (pipeline.py:30–47): rows whose account_code is not in the COA, via
    * broadcast left-anti join (SURVEY J6).
    */
  def accountInCoa(df: DataFrame, dataset: String, coaCodes: DataFrame, orderKeys: Seq[String]): DataFrame = {
    val indexed = withGlobalIndex(df, orderKeys.map(col), "__idx")
    accountInCoaIndexed(indexed, dataset, coaCodes)
  }

  /** [[accountInCoa]] over a frame that ALREADY carries the coerce-time
    * `__idx` (r17): the pipeline's RI checks used to re-derive a global
    * index — a second range-sample pass, range exchange and window sort
    * over the two biggest tables — when [[coerce]] had already ranked
    * the same rows by the SAME natural keys ([[indexOrder]] puts
    * `orderKeys` first; the remaining columns only break ties, which the
    * orderKeys-only rank left arbitrary). Reusing it drops both chains
    * from the close's critical path at identical output.
    */
  def accountInCoaIndexed(indexed: DataFrame, dataset: String,
      coaCodes: DataFrame): DataFrame = {
    indexed
      .join(broadcast(coaCodes.select(col("account_code").cast("string").as("account_code"))),
        Seq("account_code"), "left_anti")
      .select(
        lit(dataset).as("dataset"),
        col("__idx").as("index"),
        lit("account_code").as("column"),
        lit("account_in_coa").as("check"),
        col("account_code").cast("string").as("failure_case"),
        lit("Column").as("schema_context"),
        lit(null).cast("int").as("check_number"))
  }
}
