package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout.zorderWrite — the measured claim, not the brochure one: under
  * a z-ordered layout a point predicate on EITHER column touches a
  * small fraction of files, where a single-column sort leaves the other
  * column unskippable (every file's range covers everything).
  */
class ZorderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val nFiles = 16

  test("bit interleave is the Morton order on a hand-checked grid") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(Layout.interleave(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(x, y) interleaves x into even bits, y into odd:
    // (1,0)=1, (0,1)=2, (1,1)=3, (3,5)= x bits 11 -> 0b0101, y bits 101
    // -> 0b100010 ; combined 0b100111 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L), got)
  }

  test("z-order makes point predicates on both columns skip most files; single sort does not") {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val base = tmpDir("zorder")

    // layout A: classic single-column range sort on l_orderkey
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$base/by_orderkey")
    // layout B: z-ordered on (l_orderkey, l_partkey)
    Layout.zorderWrite(li, s"$base/zorder", "l_orderkey", "l_partkey", nFiles)

    // identical content either way
    val a = spark.read.parquet(s"$base/by_orderkey")
    val z = spark.read.parquet(s"$base/zorder")
    assert(a.count() == li.count() && z.count() == li.count())
    assert(z.unionByName(li).distinct().count() == li.distinct().count())

    // mid-domain probe values, derived from the data
    val mids = li.agg(avg("l_orderkey"), avg("l_partkey")).first()
    val vOrder = math.floor(mids.getDouble(0))
    val vPart = math.floor(mids.getDouble(1))

    val zoneAOrd = Layout.zoneMap(a, "l_orderkey")
    val zoneAPart = Layout.zoneMap(a, "l_partkey")
    val zoneZOrd = Layout.zoneMap(z, "l_orderkey")
    val zoneZPart = Layout.zoneMap(z, "l_partkey")

    val aOrd = Layout.filesTouched(zoneAOrd, vOrder)
    val aPart = Layout.filesTouched(zoneAPart, vPart)
    val zOrd = Layout.filesTouched(zoneZOrd, vOrder)
    val zPart = Layout.filesTouched(zoneZPart, vPart)
    info(s"files touched of $nFiles — orderkey-sorted: key1=$aOrd key2=$aPart; " +
      s"z-ordered: key1=$zOrd key2=$zPart")

    // single sort: perfect on its own key, useless on the other
    assert(aOrd <= 2, s"range sort should isolate its key: $aOrd")
    assert(aPart == nFiles.toLong, s"second key should be unskippable: $aPart")
    // z-order: BOTH keys skip most files (tiles ⇒ ~√n touched)
    assert(zOrd <= nFiles / 2, s"z-order key1 skipping too weak: $zOrd of $nFiles")
    assert(zPart <= nFiles / 2, s"z-order key2 skipping too weak: $zPart of $nFiles")
    // and the combined (point, point) tile count is small
    val both = zoneZOrd.withColumnRenamed("lo", "lo1").withColumnRenamed("hi", "hi1")
      .join(zoneZPart, "file")
      .filter(col("lo1").cast("double") <= vOrder && col("hi1").cast("double") >= vOrder &&
        col("lo").cast("double") <= vPart && col("hi").cast("double") >= vPart)
      .count()
    assert(both <= 4, s"two-column point predicate touches $both files")
    spark.catalog.clearCache()
  }

  test("quantile ranks keep files balanced on a skewed column where linear ranks degenerate") {
    // events.value is heavy-tailed (median ≈ 35, max ≈ 490): linear
    // ranks put most rows in the bottom tiles — the write inherits the
    // skew and most of the grid is near-empty. Quantile ranks equalize
    // rows per tile by construction.
    val ev = Tables.eventsTs(spark, dir).select("value", "user_id")
    val base = tmpDir("zorder_q")
    Layout.zorderWrite(ev, s"$base/linear", "value", "user_id", nFiles)
    Layout.zorderWriteQuantile(ev, s"$base/quantile", "value", "user_id", nFiles)

    def spreadOf(path: String): (Long, Long, Double) = {
      val counts = spark.read.parquet(path)
        .groupBy(input_file_name()).count()
        .collect().map(_.getLong(1))
      (counts.max, counts.min, counts.max.toDouble / math.max(counts.min, 1L))
    }
    val (lMax, lMin, lSpread) = spreadOf(s"$base/linear")
    val (qMax, qMin, qSpread) = spreadOf(s"$base/quantile")
    info(f"rows per file — linear: max=$lMax min=$lMin spread=$lSpread%.1f; " +
      f"quantile: max=$qMax min=$qMin spread=$qSpread%.1f")
    assert(spark.read.parquet(s"$base/quantile").count() == ev.count())
    // quantile: near-even by construction; linear: visibly degenerate
    assert(qSpread <= 3.0, f"quantile layout should be balanced: $qSpread%.1f")
    assert(lSpread > 2 * qSpread,
      f"skew demo vacuous: linear $lSpread%.1f vs quantile $qSpread%.1f")
    spark.catalog.clearCache()
  }
}
