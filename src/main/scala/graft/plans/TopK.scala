package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.NativeDataset

/** Public entry point for the native top-k-per-key operator.
  *
  * {{{
  *   TopK.perKey(lineitem, Seq("l_returnflag"),
  *     Seq(col("l_extendedprice").desc, col("l_orderkey")), k = 5)
  * }}}
  *
  * returns the k first rows of each key under the given order (ties
  * broken by the order itself — pass a total order for deterministic
  * output), WITHOUT sorting any partition. Row order within the result
  * is unspecified; add an `orderBy` for presentation.
  */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    // empty keys would reach ClusteredDistribution(Nil) in the exec and
    // die at planning with an opaque internal error; global top-k is
    // spelled df.orderBy(...).limit(k) (Spark's TakeOrderedAndProject)
    require(keyCols.nonEmpty,
      "perKey needs at least one key column; for global top-k use orderBy(...).limit(k)")
    val spark = df.sparkSession
    // belt-and-braces registration: sessions configured with
    // spark.sql.extensions=graft.GraftExtensions already have the
    // strategy; experimental.extraStrategies covers the rest
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    // Route the order columns through an analyzed orderBy and lift the
    // Sort node's SortOrder list: the analyzer converts the Column-API
    // sort nodes into pure (serializable) catalyst SortOrder trees —
    // converting by hand would smuggle connect-side column nodes into
    // the task closure. The Sort's child is the analyzed input plan.
    val analyzed = NativeDataset.planOf(df.orderBy(orderCols: _*))
    val (order, child) = analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(
        s"expected an analyzed Sort, got ${other.getClass.getName}")
    }
    val byName = child.output.map(a => a.name -> a).toMap
    val keys = keyCols.map(c => byName.getOrElse(c,
      throw new IllegalArgumentException(
        s"key column '$c' not in ${child.output.map(_.name).mkString(", ")}")))
    NativeDataset.ofRows(spark, TopKPerKey(keys, order, k, child))
  }
}
