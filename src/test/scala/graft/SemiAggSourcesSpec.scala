package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources
import graft.stores.SemiAggStore

class SemiAggSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("keyJoinFilter hook removes double counting through the store") {
    val store = new SemiAggStore(spark, "/root/testdata/sf0.001",
      Files.createTempDirectory("graft-semiagg").toString)
    val start = "2024-01-05"; val end = "2024-01-09"
    // unstratified: aggregate level only → series equals raw daily counts
    val unstrat = store.keyJoinFeatures("n_events", Seq.empty, start, end)
      .agg(sum("n_events")).as[Long].head()
    val rawDaily = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date(col("ts")).between(start, end)).count()
    assert(unstrat == rawDaily, "aggregate level must not double count")
    // stratified by loc: per-user level; total still equals raw count
    val strat = store.keyJoinFeatures("n_events", Seq("loc"), start, end)
      .agg(sum("n_events")).as[Long].head()
    assert(strat == rawDaily, "per-loc level must not double count")
  }

  test("store write lock blocks a second writer until released") {
    val store = new SemiAggStore(spark, "/root/testdata/sf0.001",
      Files.createTempDirectory("graft-lock").toString) {
      override protected def lockWaitMaxMs: Long = 500L
    }
    store.withTableLock("t") {
      intercept[IllegalStateException] {
        store.withTableLock("t") { fail("must not enter") }
      }
    }
    // released → can lock again
    store.withTableLock("t") { () }
  }

  test("csv metric store: Ecdc-style long-format ingest end-to-end") {
    val dir = Files.createTempDirectory("graft-ecdc")
    java.nio.file.Files.writeString(dir.resolve("metrics.csv"),
      """date,location,indicator,value
        |2024-01-01,dk,cases,5
        |2024-01-01,se,cases,3
        |2024-01-02,dk,cases,2
        |2024-01-02,dk,admissions,1
        |2024-01-03,se,cases,4
        |""".stripMargin)
    val store = new graft.stores.CsvMetricStore(spark, dir.toString,
      Files.createTempDirectory("graft-ecdc-store").toString)
    assert(store.availableObservables.toSet ==
      Set("n_cases", "n_admissions"))
    // unstratified daily sum across locations
    val series = store.keyJoinFeatures("n_cases", Seq.empty,
      "2024-01-01", "2024-01-03")
      .orderBy("date")
      .select(col("date").cast("string"), col("n_cases").cast("long"))
      .as[(String, Long)].collect().toSeq
    assert(series == Seq(("2024-01-01", 8L), ("2024-01-02", 2L),
      ("2024-01-03", 4L)))
    // stratified by location
    val byLoc = store.keyJoinFeatures("n_cases", Seq("location"),
      "2024-01-01", "2024-01-03")
      .filter(col("location") === "dk").orderBy("date")
      .select(col("n_cases").cast("long")).as[Long].collect().toSeq
    assert(byLoc == Seq(5L, 2L, 0L))
    // conformance battery over the csv-sourced store
    val failures = graft.core.StoreConformance.run(
      () => new graft.stores.CsvMetricStore(spark, dir.toString,
        Files.createTempDirectory("graft-ecdc-conf").toString),
      "2024-01-01", "2024-01-03", midpoint = "2024-01-02")
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("schema-enforced csv source and unpivot") {
    val dir = Files.createTempDirectory("graft-csv")
    java.nio.file.Files.writeString(dir.resolve("d.csv"),
      "id,m1,m2\n1,10,0.5\n2,20,1.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("m1", IntegerType),
      StructField("m2", DoubleType)))
    val df = Sources.csv(spark, dir.toString, schema)
    assert(df.schema == schema && df.count() == 2)
    val long = Sources.unpivot(df, Seq("id"), Seq("m1", "m2"))
      .as[(Long, String, Double)].collect().toSet
    assert(long == Set((1L, "m1", 10.0), (1L, "m2", 0.5),
      (2L, "m1", 20.0), (2L, "m2", 1.5)))
  }
}
