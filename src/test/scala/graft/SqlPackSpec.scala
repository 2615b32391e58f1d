package graft

import org.apache.spark.sql.functions._

/** q51 (native kernels through spark.sql) validated against the
  * DataFrame formulation of the same aggregates. */
class SqlPackSpec extends SparkSpec {
  import spark.implicits._

  test("q51 SQL-registered kernels match the DataFrame formulation") {
    val dir = "/root/testdata/sf0.001"
    val viaSql = graft.SparkEntry.queries("q51_sql_native_fns")(spark, dir)
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(viaSql.nonEmpty)

    val ws = split(trim(col("text")), "\\s+")
    val viaDf = graft.core.Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.NativeExprs.wordNgrams(ws, 3)))
          .as("n_shingles"),
        sum(element_at(graft.functions.NativeExprs.minhashSignature(
          graft.functions.NativeExprs.wordNgrams(ws, 3), 16), 1))
          .as("sig1_sum"),
        sum(bit_count(graft.functions.NativeExprs.simhash64(
          graft.functions.NativeExprs.wordNgrams(ws, 2))))
          .as("simhash_bits"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(viaSql == viaDf)
  }
}
