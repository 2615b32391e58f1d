package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-drift monitoring on the ingest stream: per-(window, group)
  * bottom-k shingle sketches maintained as a STREAMING AGGREGATE.
  * Because [[graft.functions.Sketches.BottomK]] is a mergeable typed
  * Aggregator, the state store holds exactly the bounded ≤ k-long
  * sketch buffer per key — never raw grams, never documents — and
  * out-of-order batches fold in through the same merge the batch
  * aggregate uses, so the closed-window sketch is IDENTICAL to the
  * batch sketch of the same rows (the sketch is order-independent by
  * construction; SketchStreamSpec proves equality).
  *
  * Downstream, [[graft.operators.CorpusSim.pairJaccard]] on
  * consecutive windows of one group gives the drift series ("is
  * today's crawl of src_x still the same corpus as yesterday's?"),
  * and across groups within a window the same pairwise overlap q106
  * computes in batch. Both are driver-side model-sized computations
  * over collected sketch rows.
  */
object SketchStream {

  /** Event-time-windowed per-group sketches: (window_start, groupCol,
    * sketch ARRAY<BIGINT>). The watermark bounds state and closes
    * windows for append output. */
  def windowedSketches(docs: DataFrame, groupCol: String, textCol: String,
                       tsCol: String, duration: String, watermark: String,
                       n: Int, k: Int): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(groupCol),
        explode(graft.operators.CorpusSim.gramHash(col(textCol), n))
          .as("__gh"))
      .groupBy(window(col(tsCol), duration), col(groupCol))
      .agg(graft.functions.Sketches.bottomK(col("__gh"), k).as("sketch"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("sketch"))
}
