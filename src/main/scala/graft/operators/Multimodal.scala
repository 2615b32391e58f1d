package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Assets travel as opaque `BINARY` columns plus a typed metadata struct;
  * decode / feature-extraction runs partition-parallel over batches. The
  * actual media decoding is STUBBED (this container has no image/audio
  * codecs): `decodeStub` derives a deterministic fake feature vector from
  * the bytes. The Spark-side contracts — schema, batching, partition
  * parallelism, output shapes — are real and tested.
  */
object Multimodal {

  /** Canonical asset schema: (asset_id, kind, content, meta{width,height,format}). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))))
  ))

  /** STUB decode: a real implementation would decode the media and run a
    * feature extractor; this derives `dim` deterministic pseudo-features
    * from a rolling hash of the bytes so the plumbing is testable. */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      h = 31 * h + content(i)
      out(i % dim) += ((h >>> 33) % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Partition-parallel feature extraction over the binary column.
    * Batch shape: one task per partition, rows streamed — constant
    * memory; repartition upstream to bound per-task bytes. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val session = df.sparkSession
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "content") :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val contentIdx = df.schema.fieldIndex("content")
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val feats = decodeStub(r.getAs[Array[Byte]](contentIdx), dim)
        Row.fromSeq(keepIdx.map(r.get) :+ feats.toSeq)
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame sampling for "video" assets: split the payload
    * into `n` evenly spaced chunks (stub for frame extraction); output one
    * row per sampled frame with its index and byte span. */
  def frameSample(df: DataFrame, n: Int): DataFrame = {
    df.withColumn("__len", length(col("content")))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * col("__len") / n).cast("long"))
      .withColumn("frame_bytes",
        expr(s"substring(content, cast(frame_offset + 1 as int), " +
          s"cast(greatest(__len div $n, 1) as int))"))
      .drop("__len")
  }

  /** Resize metadata transform (stub: real path would re-encode pixels;
    * here only the typed metadata is rewritten, content passed through). */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.format").as("format")))
}
