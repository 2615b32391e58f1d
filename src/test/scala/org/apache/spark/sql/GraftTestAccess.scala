package org.apache.spark.sql

/** Test-only bridge into `private[sql]`/`private[spark]` state.
  *
  * CacheLifecycleSpec needs two things the public API hides: whether
  * the session's CacheManager holds any InMemoryRelation (the exact
  * definition of a leaked `cache()`/`persist()`), and whether a
  * persistent RDD is merely a localCheckpoint block (self-releasing,
  * tolerated) rather than a cache entry.
  */
object GraftTestAccess {
  def cachedPlanCount(spark: SparkSession): Int = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    if (cm.isEmpty) 0 else 1
  }

  def isLocallyCheckpointed(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
    org.apache.spark.rdd.GraftRddAccess.isLocallyCheckpointed(rdd)
}
