package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control for scan pruning — the write-side half of the
  * skipping story: parquet footers carry per-file min/max, and the
  * reader (or any engine's zone-map logic) skips files whose range
  * can't match a predicate. A single-column sort makes those ranges
  * selective on ONE column only; Z-ORDERING (Morton-interleaving the
  * bit-ranks of two columns, then range-partitioning on the z-value)
  * makes files square-ish tiles in (c1, c2) space, so point/range
  * predicates on EITHER column touch ~√files instead of all of them —
  * Delta/Iceberg's OPTIMIZE ZORDER, done on plain parquet.
  *
  * Ranks come from linear min/max scaling to `bits` bits (one tiny agg
  * for the bounds — scalars in the formula, not a data collect). Linear
  * scaling tiles uniformly-distributed keys well; heavily skewed
  * columns would want quantile buckets instead — same interleave,
  * different rank fn.
  */
object Layout {

  /** Morton z-value of two already-scaled non-negative int ranks
    * (each < 2^bits): bit i of each lands at positions 2i / 2i+1.
    * Unrolled into a codegen-friendly bitwise expression — no UDF.
    */
  private[core] def interleave(r1: Column, r2: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(r1, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(r2, i).bitwiseAND(1), 2 * i + 1)))
        .cast("long")
    }.reduce(_.bitwiseOR(_))

  /** scale a numeric column to an integer rank in [0, 2^bits). */
  private def rankOf(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, 1e-300) // degenerate constant column
    floor((c.cast("double") - lit(lo)) / lit(span) * lit((1 << bits) - 1) + 0.5)
      .cast("long")
  }

  /** Write `df` z-ordered on (c1, c2) into ~`nFiles` parquet files:
    * rank both columns, interleave to the z-value, and assign each row
    * to an EXPLICIT tile — the interleave of the top ⌈log₄ nFiles⌉
    * bits of each rank — so every output file owns one square-ish
    * value-domain tile exactly (range-sampling the full z instead puts
    * boundaries mid-tile and smears ranges across files; the tile id
    * makes the grid deterministic in VALUE space, immune to row-count
    * skew between tiles). Rows sort by the full z within partitions so
    * row groups inherit the locality. Neither helper column reaches
    * the files.
    */
  def zorderWrite(df: DataFrame, path: String, c1: String, c2: String,
      nFiles: Int, bits: Int = 16): Unit = {
    val b = df.agg(min(c1), max(c1), min(c2), max(c2)).first()
    def d(i: Int): Double = b.get(i) match {
      case n: java.lang.Number => n.doubleValue()
      case x => sys.error(s"z-order needs numeric bounds, got $x")
    }
    writeTiled(df, path,
      rankOf(col(c1), d(0), d(1), bits),
      rankOf(col(c2), d(2), d(3), bits), nFiles, bits)
  }

  /** [[zorderWrite]] with QUANTILE ranks — the variant for SKEWED
    * columns: linear min/max scaling maps rank to VALUE position, so a
    * heavy-tailed column piles most rows into the bottom few tiles and
    * leaves the rest near-empty (file sizes then differ by orders of
    * magnitude and the write itself inherits the skew). Quantile ranks
    * map to ROW position: boundaries from `approxQuantile` (a
    * driver-side array of 2^bits − 1 scalars), rank = count of
    * boundaries ≤ x as an unrolled codegen'd comparison sum — every
    * tile holds ~equal rows by construction, at the cost of
    * data-dependent (but recorded-in-footer) tile value-ranges.
    */
  def zorderWriteQuantile(df: DataFrame, path: String, c1: String, c2: String,
      nFiles: Int, bits: Int = 6, relErr: Double = 0.001): Unit = {
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    // ONE pass computes both boundary arrays (the multi-column
    // approxQuantile overload) — two single-column calls would scan the
    // input twice before the write's own scan
    val Array(bs1, bs2) = df.stat.approxQuantile(Array(c1, c2), probs, relErr)
    def rank(c: String, bs: Array[Double]): Column = {
      // approxQuantile returns an EMPTY array on an empty input or an
      // all-null column — the same degenerate inputs the linear path
      // rejects via its bounds check
      require(bs.nonEmpty,
        s"z-order needs numeric quantile boundaries for $c (empty or all-null input)")
      coalesce(
        bs.map(b => when(col(c).cast("double") >= lit(b), 1L).otherwise(0L))
          .reduce(_ + _), lit(0L))
    }
    writeTiled(df, path, rank(c1, bs1), rank(c2, bs2), nFiles, bits)
  }

  private def writeTiled(df: DataFrame, path: String, r1: Column, r2: Column,
      nFiles: Int, bits: Int): Unit = {
    // per-dimension tile bits: 4^t >= nFiles, clamped to the rank width
    // (beyond it there are no more rank bits to split on — and an
    // unclamped t would make `bits - t` negative, which Java long
    // shifts wrap mod 64: every row would land in tile 0 and the
    // entire dataset in ONE file, silently)
    val t = math.min(bits,
      math.max(1, math.ceil(math.log(nFiles.toDouble) / math.log(4.0)).toInt))
    df.withColumn("_z", interleave(r1, r2, bits))
      .withColumn("_ztile", interleave(
        shiftright(r1, bits - t), shiftright(r2, bits - t), t))
      // range-partition on the tile id ALONE: all rows of a tile carry
      // the same key, so a range boundary can never split a tile across
      // files (at worst two sparse tiles share a file) — partitioning on
      // (tile, z) instead lets sampled boundaries land mid-tile and
      // widens file ranges to two tiles each
      .repartitionByRange(nFiles, col("_ztile"))
      .sortWithinPartitions("_z")
      .drop("_z", "_ztile")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file zone map of a parquet dataset: (file, min, max, rows) for
    * `key` — what a skipping reader consults. One aggregation grouped
    * by `input_file_name`, no second scan.
    */
  def zoneMap(df: DataFrame, key: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(key).as("lo"), max(key).as("hi"), count(lit(1)).as("rows"))

  /** How many files a point predicate `key = v` may touch under this
    * layout — the number whose zone-map range covers v. The skipping
    * metric the ZorderSpec measures.
    */
  def filesTouched(zones: DataFrame, v: Double): Long =
    zones.filter(col("lo").cast("double") <= v && col("hi").cast("double") >= v)
      .count()
}
