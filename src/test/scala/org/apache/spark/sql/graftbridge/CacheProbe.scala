package org.apache.spark.sql.graftbridge

/** Test-only cache introspection: whether the session's Catalyst cache
  * holds any entries — lets specs assert that library transforms release
  * their working caches. Lives under `org.apache.spark.sql` (test scope
  * only) to reach the `private[sql]` shared state.
  */
object CacheProbe {
  def noCachedPlans(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
