package graft.core

/** Process-wide keyed mutexes: same-JVM writer exclusion for
  * state-directory read-modify-write cycles. One canonical
  * implementation — `FeatureStore.withTableLock` (which layers an FS
  * marker file on top for cross-process exclusion) and
  * `SeriesStream.commitBatch` both lock through here, so timeout
  * semantics stay consistent. */
object KeyedLocks {
  private val locks = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.locks.ReentrantLock]

  /** Run `body` holding the JVM lock for `key`; waits up to
    * `timeoutMs` (default: unbounded). */
  def withLock[T](key: String, timeoutMs: Long = Long.MaxValue)
                 (body: => T): T = {
    val l = locks.getOrElseUpdate(key,
      new java.util.concurrent.locks.ReentrantLock)
    if (timeoutMs == Long.MaxValue) l.lock()
    else if (!l.tryLock(timeoutMs,
        java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new IllegalStateException(
        s"Lock not released within ${timeoutMs / 1000}s: $key")
    try body finally l.unlock()
  }
}
