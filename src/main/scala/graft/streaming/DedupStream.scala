package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate suppression — the streaming twin of
  * `Dedup.minhashLsh`. Two tiers, same minhash kernel as batch:
  *
  *  1. `signatureDedup` — drop docs whose FULL minhash signature was
  *     already seen (Jaccard ≈ 1 near-exact dups). One built-in
  *     stateful op (`dropDuplicates`), bounded by the watermark; clean
  *     append semantics.
  *  2. `bandVerdicts` — per (band, bucket) first-seen state: each doc's
  *     bands report whether an EARLIER doc already claimed the bucket.
  *     Any non-first band makes the doc a near-dup candidate of the
  *     stream's history (the same pigeonhole bound as batch LSH).
  *     Verdict reduction (all-bands-first ⇒ keep) happens per doc in
  *     the sink via `candidateIds` — downstream of a
  *     flatMapGroupsWithState append stream, a second stateful
  *     aggregation cannot finalize without event-time, so the reduce
  *     belongs in foreachBatch, where production pipelines sink
  *     candidates anyway.
  *
  * State is one long per occupied LSH bucket — proportional to corpus
  * novelty, not stream length, which is what survives an unbounded
  * ingest feed.
  */
object DedupStream {

  /** Stable single-column dedup key for a doc's full minhash signature.
    * The exact signature values, comma-joined — no lossy re-hash. */
  def signatureKey(text: org.apache.spark.sql.Column, numHashes: Int)
      : org.apache.spark.sql.Column =
    concat_ws(",",
      graft.functions.NativeExprs.minhashSignature(
        Dedup.shingleArray(text, 3), numHashes))

  /** Near-exact streaming dedup: first doc per full signature passes.
    * Pass `tsCol`/`watermark` to bound state (production); omit for
    * deterministic unbounded-state tests. */
  def signatureDedup(docs: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 16, tsCol: String = "",
                     watermark: String = ""): DataFrame = {
    val keyed = docs.withColumn("__sigkey",
      signatureKey(col(textCol), numHashes))
    (if (tsCol.nonEmpty)
      // state bounded: a signature re-appearing after the watermark
      // horizon is admitted again (the production trade)
      keyed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("__sigkey")
    else keyed.dropDuplicates("__sigkey"))
      .drop("__sigkey")
  }

  case class BandHit(doc_id: Long, band: Int, bucket: Long)
  case class BandVerdict(doc_id: Long, band: Int, first: Boolean)

  /** Same banding as `Dedup.minhashLsh`: signature sliced into `bands`
    * groups of `numHashes / bands`, each hashed to a bucket id. */
  def bandHits(docs: DataFrame, idCol: String, textCol: String,
               numHashes: Int, bands: Int): Dataset[BandHit] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.NativeExprs.minhashSignature(
          Dedup.shingleArray(col(textCol), 3), numHashes).as("__sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bi => xxhash64(concat_ws(",",
            transform(slice(col("__sig"), bi * lit(r) + 1, lit(r)),
              _.cast("string")))))))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("bucket"))
      .as[BandHit]
  }

  /** First-seen verdict per (band, bucket). Within a micro-batch, ties
    * go to the lowest doc_id (deterministic). State: the bucket's owner
    * doc id. */
  def bandVerdicts(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 16, bands: Int = 4)
      : Dataset[BandVerdict] = {
    val hits = bandHits(docs, idCol, textCol, numHashes, bands)
    import hits.sparkSession.implicits._
    hits.groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState[Long, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, _), hs, state: GroupState[Long]) =>
          val sorted = hs.toSeq.sortBy(_.doc_id)
          state.getOption match {
            case Some(owner) =>
              sorted.iterator.map(h =>
                BandVerdict(h.doc_id, band, first = h.doc_id == owner))
            case None =>
              state.update(sorted.head.doc_id)
              (BandVerdict(sorted.head.doc_id, band, first = true) +:
                sorted.tail.map(h => BandVerdict(h.doc_id, band,
                  first = false))).iterator
          }
      }
  }

  case class BandHitT(doc_id: Long, band: Int, bucket: Long,
                      ts: java.sql.Timestamp)

  /** TTL variant of [[bandVerdicts]] for unbounded streams: per-bucket
    * first-seen state carries an event-time lease of `ttlMs` past the
    * bucket's latest hit, renewed on every touch and evicted by the
    * advancing watermark (EventTimeTimeout — deterministic in tests,
    * unlike processing-time, and fires exactly when the stream's own
    * clock passes the lease). A bucket whose owner ages out is claimable
    * again — the same bounded-memory trade `signatureDedup` makes with
    * `dropDuplicatesWithinWatermark`: state is proportional to the
    * novelty seen within one TTL horizon, not to stream length. */
  def bandVerdictsTtl(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String, watermark: String, ttlMs: Long,
                      numHashes: Int = 16, bands: Int = 4)
      : Dataset[BandVerdict] = {
    require(ttlMs > 0, "ttlMs must be positive")
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    import docs.sparkSession.implicits._
    // the watermark is declared AFTER the projection: casting/aliasing
    // the event-time attribute would strip the watermark tag, and
    // EventTimeTimeout refuses to run without one
    val hits = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).cast("timestamp").as("__ts"),
        graft.functions.NativeExprs.minhashSignature(
          Dedup.shingleArray(col(textCol), 3), numHashes).as("__sig"))
      .select(col("doc_id"), col("__ts"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bi => xxhash64(concat_ws(",",
            transform(slice(col("__sig"), bi * lit(r) + 1, lit(r)),
              _.cast("string")))))))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("bucket"), col("__ts").as("ts"))
      .withWatermark("ts", watermark)
      .as[BandHitT]
    hits.groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState[Long, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), hs, state: GroupState[Long]) =>
          if (state.hasTimedOut) { // lease expired: free the bucket
            state.remove()
            Iterator.empty
          } else {
            val sorted = hs.toSeq.sortBy(_.doc_id)
            val out = state.getOption match {
              case Some(owner) =>
                sorted.map(h =>
                  BandVerdict(h.doc_id, band, first = h.doc_id == owner))
              case None =>
                state.update(sorted.head.doc_id)
                BandVerdict(sorted.head.doc_id, band, first = true) +:
                  sorted.tail.map(h =>
                    BandVerdict(h.doc_id, band, first = false))
            }
            // renew the lease; the timeout timestamp must stay ahead of
            // the watermark, so clamp when a straggler batch arrives late
            val lease = sorted.map(_.ts.getTime).max + ttlMs
            state.setTimeoutTimestamp(
              math.max(lease, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** Batch-side reduction (foreachBatch / collected sink): doc ids with
    * at least one non-first band — near-dup candidates of earlier
    * stream history. */
  def candidateIds(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("doc_id")
      .agg(min(col("first").cast("int")).as("__allfirst"))
      .filter(col("__allfirst") === 0)
      .select("doc_id")

  /** STREAM-vs-CORPUS probe: the streaming twin of
    * `Dedup.minhashProbePortable` — each arriving doc is scored against
    * a STATIC reference corpus (its band index, typically a
    * materialized table refreshed out of band). Entirely STATELESS:
    * per-row signature/banding, two stream-static equi-joins, per-row
    * match scoring — a pure append stream with zero state store, safe
    * on an unbounded feed with no watermark required.
    *
    * The price of statelessness: a (new, corpus) pair colliding in b
    * bands is emitted b times, each row carrying the same `n_match`
    * verdict (the score comes from the full signatures, not the band).
    * Rows are idempotent by (new_id, corpus_id); a keyed sink upserts
    * them away — where a production pipeline lands candidates anyway.
    * The batch operator keeps the in-plan `distinct`. */
  def probeStream(incoming: DataFrame, corpus: DataFrame,
                  idCol: String, textCol: String,
                  n: Int, numPerms: Int, bands: Int,
                  minMatch: Int): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val r = numPerms / bands
    val corpusSigs = Dedup.portableSigs(corpus, idCol, textCol, n, numPerms)
      .withColumnRenamed(idCol, "corpus_id")
    val corpusIndex = Dedup.portableBands(corpusSigs, "corpus_id", bands, r)
      .join(corpusSigs.withColumnRenamed("__sig", "__sb"), "corpus_id")
      .withColumnRenamed("__band", "__band_c")
      .withColumnRenamed("__bkey", "__bkey_c")
    // the stream side CARRIES its signature through the band explode —
    // re-attaching it by a join would make both join legs derive from
    // the stream, and Spark would plan a stateful (unbounded-state)
    // stream-stream join; corpus-side re-attach is fine, it's static
    val newSigs = Dedup.portableSigs(incoming, idCol, textCol, n, numPerms)
      .withColumnRenamed(idCol, "new_id")
      .withColumnRenamed("__sig", "__sa")
    val newBands = newSigs.select(col("new_id"), col("__sa"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        concat_ws(",", transform(
          slice(col("__sa"), b * lit(r) + 1, lit(r)), _.cast("string"))))))
      .select(col("new_id"), col("__sa"),
        col("pos").as("__band"), col("col").as("__bkey"))
    newBands
      .join(corpusIndex,
        col("__band") === col("__band_c") &&
          col("__bkey") === col("__bkey_c"))
      .select(col("new_id"), col("corpus_id"),
        size(filter(zip_with(col("__sa"), col("__sb"),
          (x, y) => x === y), m => m)).cast("long").as("n_match"))
      .filter(col("n_match") >= minMatch)
  }
}
