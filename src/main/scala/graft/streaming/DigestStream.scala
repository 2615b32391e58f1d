package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Continuous twin of [[graft.operators.Profile.contentDigest]]: the
  * digest is a commutative monoid — (n, Σhash) merges by addition — so
  * Spark's built-in stateful aggregation maintains it EXACTLY under
  * append-only ingest, with state bounded by group cardinality. The
  * live digest of an ingest feed can be compared against the batch
  * digest of the landed table at any point (complete-mode sink):
  * equal counts + equal digests ⇒ the replica matches, no join, no
  * re-read of either side.
  *
  * Exactly-once caveat: digests assume each row folds once — wrap
  * replayable sources with [[Commits.appendIfAbsent]]-style commit
  * dedup (the [[LineDedupStream]] posture) or an idempotent sink. */
object DigestStream {

  /** Streaming per-group (n_rows, digest): same row hash, same modulus
    * as the batch operator, so the two sides are bit-comparable. The
    * mod-2^62 fold is applied at READ (the running state keeps the
    * exact decimal(38,0) sum — modding per-batch would also be sound,
    * but matching the batch operator's single final mod keeps the
    * plans identical). */
  def digests(stream: DataFrame, groupCol: String,
              cols: Seq[String]): DataFrame =
    stream.select(col(groupCol), Profile.rowHash(cols).as("__h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast("decimal(38,0)")).as("__s"))
      .select(col(groupCol), col("n_rows"),
        expr("cast(__s % 4611686018427387904 as bigint)").as("digest"))
}
