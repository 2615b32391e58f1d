package org.apache.spark.rdd

/** Test-only bridge: `RDD.isLocallyCheckpointed` is private[rdd], but
  * CacheLifecycleSpec needs it to tell self-releasing localCheckpoint
  * blocks apart from leaked `cache()`/`persist()` entries. */
object GraftRddAccess {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
