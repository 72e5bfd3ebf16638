package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property check for the native top-k operator: on randomized frames
  * (duplicate order values forcing tie-breaks, skewed key histograms,
  * k above/at/below group sizes, nulls in both key and order columns),
  * [[TopK.perKey]] must return exactly the window-rank formulation's
  * row set. Randomization covers shapes the fixed-corpus tests don't:
  * every group size relative to k, heap-replacement churn under
  * shuffled input order, and multi-column total orders.
  */
class TopKPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomFrame(seed: Long, n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val key = if (rnd.nextInt(20) == 0) null
        else s"k${rnd.nextInt(1 + rnd.nextInt(12))}" // skewed key histogram
      val v = if (rnd.nextInt(25) == 0) null
        else Int.box(rnd.nextInt(8)) // few distinct values → many ties
      (key, v, i.toLong) // i = unique tiebreak
    }
    rows.toDF("key", "v", "id").repartition(5) // shuffled physical order
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("TopK.perKey == window-rank on random frames (3 seeds × 3 ks)") {
    for (seed <- Seq(7L, 99L, 2024L); k <- Seq(1, 3, 50)) {
      val df = randomFrame(seed, 400)
      val order = Seq(col("v").desc, col("id").asc)
      val native = TopK.perKey(df, Seq("key"), order, k)
      val w = Window.partitionBy("key").orderBy(order: _*)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
      assert(canon(native) == canon(windowed), s"seed=$seed k=$k")
    }
  }
}
