package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational MERGE / SCD-1 upsert — the algebra Delta/Iceberg MERGE
  * INTO executes under the hood: ONE full-outer join of snapshot ×
  * changes on the key (both sides shuffle-partitioned by it, so a
  * 100 TB merge scales by key range, and AQE may still broadcast a
  * small change batch), then a row-wise CASE — delete rows drop,
  * update/insert rows take the change image, untouched rows pass
  * through.
  *
  * Semantics are oracle-pinned through `j10_cdc_merge` (which
  * delegates here); the continuous apply-loop is
  * [[graft.streaming.StreamingOps.cdcUpsertStream]].
  */
object Merge {

  /** Apply a CDC batch to a keyed snapshot. `changes` must carry every
    * snapshot column plus `opCol` ∈ {"I", "U", "D"}, and AT MOST ONE
    * row per key: a batch with two ops on one key (I then U from an
    * arbitrary micro-batch cut) would match the full-outer join twice
    * and emit duplicate snapshot rows that every later version
    * inherits — the same condition Delta/Iceberg MERGE rejects as
    * "multiple source rows matched", rejected here with the same
    * fail-fast (the check is one aggregation over the batch-sized
    * change side, never the snapshot). Compact the feed to
    * last-change-per-key upstream, where its sequence column lives.
    * Non-key values resolve change-side-first via coalesce, which
    * means an UPDATE cannot set a column to NULL (it falls back to the
    * snapshot value) — the usual column-coalesce MERGE caveat; model
    * explicit nulling with a sentinel upstream if the domain needs it.
    */
  def scd1Upsert(snapshot: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    // a snapshot column named like opCol would land in dataCols, force
    // changes to carry it twice, and emit ambiguous duplicate columns —
    // reject up front with a usable message instead
    require(!snapshot.columns.contains(opCol),
      s"snapshot already has a column named '$opCol'; pass a different opCol")
    val dataCols = snapshot.columns.filterNot(_ == key).toSeq
    val missing = (key +: dataCols :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes frame is missing required columns: ${missing.mkString(", ")}")
    val dupKeys = changes.groupBy(col(key)).count().filter(col("count") > 1)
    val sample = dupKeys.take(3)
    require(sample.isEmpty,
      s"multiple change rows matched one key (e.g. ${sample.map(_.get(0)).mkString(", ")}): " +
        "compact the batch to last-change-per-key before merging")
    val c = changes.select((key +: dataCols :+ opCol).map(col): _*)
    snapshot.as("s").join(c.as("c"),
        col(s"s.$key") === col(s"c.$key"), "full_outer")
      .filter(coalesce(col(opCol), lit("keep")) =!= "D")
      .select(
        coalesce(col(s"c.$key"), col(s"s.$key")).as(key) +:
          dataCols.map(d => coalesce(col(s"c.$d"), col(s"s.$d")).as(d)): _*)
  }
}
