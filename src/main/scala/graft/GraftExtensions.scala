package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{CosineSimilarity, JaccardSimilarity}

/** Session extension point: registers this library's native Catalyst
  * functions so they're available as SQL (`cosine_similarity(a, b)`,
  * `jaccard_similarity(a, b)`) and through `expr(...)` in every session
  * configured with `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      CosineSimilarity.info,
      children => {
        require(children.length == 2,
          s"cosine_similarity expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaccard_similarity"),
      JaccardSimilarity.info,
      children => {
        require(children.length == 2,
          s"jaccard_similarity expects 2 arguments, got ${children.length}")
        JaccardSimilarity(children.head, children(1))
      }))
  }
}
