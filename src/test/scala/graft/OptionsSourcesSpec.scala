package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{Options, Pluck}
import graft.sources.Sources

/** Scoped options (diseasyoption), strict pluck, and source-path
  * resolution (source_conn helpers). */
class OptionsSourcesSpec extends SparkSpec {

  test("scoped option lookup: specific beats general beats default") {
    spark.conf.set("graft.remote_conn", "general-conn")
    spark.conf.set("graft.TpchOrders.remote_conn", "specific-conn")
    spark.conf.set("graft.TpchOrders.empty_opt", "")
    try {
      // store-specific wins; label forms canonicalize to the same scope
      assert(Options.get(spark, "remote_conn", "TpchOrders")
        .contains("specific-conn"))
      assert(Options.get(spark, "remote_conn", "tpch orders")
        .contains("specific-conn"))
      // other stores see only the general value
      assert(Options.get(spark, "remote_conn", "SemiAggEvents")
        .contains("general-conn"))
      assert(Options.get(spark, "remote_conn").contains("general-conn"))
      // empty string counts as unset → falls through to general
      assert(Options.get(spark, "empty_opt", "TpchOrders",
        default = "dflt").contains("dflt"))
      // unknown option → default → None
      assert(Options.get(spark, "nope", "TpchOrders").isEmpty)
      // scoped view: specific value replaces the general one
      val m = Options.scoped(spark, "TpchOrders")
      assert(m.get("remote_conn").contains("specific-conn"))
      val m2 = Options.scoped(spark, "SemiAggEvents")
      assert(m2.get("remote_conn").contains("general-conn"))
    } finally {
      spark.conf.unset("graft.remote_conn")
      spark.conf.unset("graft.TpchOrders.remote_conn")
      spark.conf.unset("graft.TpchOrders.empty_opt")
    }
  }

  test("lock wait options reach the store's lock loop") {
    spark.conf.set("graft.lock_wait_max_ms", "120")
    spark.conf.set("graft.lock_wait_increment_ms", "10")
    try {
      val store = graft.stores.TpchFeatureStore(spark,
        "/root/testdata/sf0.001",
        Files.createTempDirectory("graft-lockopt").toString)
      // hold the lock in another thread, then time out quickly
      val held = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => store.withTableLock("t") {
        held.countDown(); release.await()
      })
      t.start(); held.await()
      val err = intercept[IllegalStateException] {
        store.withTableLock("t") { () }
      }
      assert(err.getMessage.contains("Lock not released"))
      release.countDown(); t.join()
      // lock free again → acquires immediately
      store.withTableLock("t") { () }
    } finally {
      spark.conf.unset("graft.lock_wait_max_ms")
      spark.conf.unset("graft.lock_wait_increment_ms")
    }
  }

  test("store-scoped lock options reach factory-built stores") {
    // TpchFeatureStore is built as a plain FeatureStore by a factory —
    // the graft.TpchOrders.* tier must still resolve (storeScope)
    spark.conf.set("graft.TpchOrders.lock_wait_max_ms", "120")
    spark.conf.set("graft.TpchOrders.lock_wait_increment_ms", "10")
    try {
      val store = graft.stores.TpchFeatureStore(spark,
        "/root/testdata/sf0.001",
        Files.createTempDirectory("graft-lockscope").toString)
      val held = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => store.withTableLock("t") {
        held.countDown(); release.await()
      })
      t.start(); held.await()
      val t0 = System.currentTimeMillis()
      intercept[IllegalStateException] { store.withTableLock("t") { () } }
      assert(System.currentTimeMillis() - t0 < 5000,
        "store-scoped 120ms wait was not honored")
      release.countDown(); t.join()
    } finally {
      spark.conf.unset("graft.TpchOrders.lock_wait_max_ms")
      spark.conf.unset("graft.TpchOrders.lock_wait_increment_ms")
    }
  }

  test("strict pluck errors on missing column, passes through present") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "name")
    assert(df.select(Pluck(df, "name")).as[String].head() == "a")
    val err = intercept[IllegalArgumentException] { Pluck(df, "nope") }
    assert(err.getMessage.contains("nope not found"))
    assert(Pluck(Map("a" -> "1"), "a") == "1")
    intercept[IllegalArgumentException] { Pluck(Map("a" -> "1"), "b") }
  }

  test("jsonLines: schema-enforced read, malformed rows quarantined") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("feed.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"id": 1, "name": "alpha", "score": 10}""",
      """{"id": 2, "name": "beta", "score": 20}""",
      """{"id": 3, "name": "gamma", "score": }""", // malformed
      """not json at all""",
      """{"id": 5, "name": "delta", "score": 50}"""))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, score BIGINT")
    val (clean, bad) = Sources.quarantine(
      Sources.jsonLines(spark, f.toString, schema))
    val rows = clean.as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "alpha", 10L), (2L, "beta", 20L),
      (5L, "delta", 50L)))
    assert(clean.columns.toSeq == Seq("id", "name", "score"))
    // quarantined rows carry the raw line for replay
    val raw = bad.as[String].collect()
    assert(raw.length == 2)
    assert(raw.exists(_.contains("gamma")))
    assert(raw.contains("not json at all"))
  }

  test("resolvePath: directory prefix match (zipped forms) and URL join") {
    val dir = Files.createTempDirectory("graft-srcconn")
    Files.writeString(dir.resolve("metrics.csv.gz"), "x")
    Files.writeString(dir.resolve("other.csv"), "y")
    assert(Sources.resolvePath(spark, dir.toString, "metrics.csv")
      .endsWith("metrics.csv.gz"))
    assert(Sources.resolvePath(spark, "https://example.org/data/",
      "metrics.csv") == "https://example.org/data/metrics.csv")
    val err = intercept[IllegalArgumentException] {
      Sources.resolvePath(spark, dir.toString, "missing.csv")
    }
    assert(err.getMessage.contains("could not be found"))
  }

  test("resolveDated: latest chronologically-earlier dated snapshot") {
    val listing = Seq(
      "snapshot_2024-03-01.csv", "snapshot_2024-03-10.csv",
      "snapshot_2024-03-20.csv", "unrelated_2024-03-15.csv")
    assert(Sources.resolveDated(listing, "snapshot_2024-03-15.csv")
      .contains("snapshot_2024-03-10.csv"))
    // exact date present → itself
    assert(Sources.resolveDated(listing, "snapshot_2024-03-10.csv")
      .contains("snapshot_2024-03-10.csv"))
    // all candidates later → none
    assert(Sources.resolveDated(listing, "snapshot_2024-02-01.csv").isEmpty)

    val dir = Files.createTempDirectory("graft-dated")
    Files.createDirectory(dir.resolve("drops"))
    Files.writeString(dir.resolve("drops/d_2024-01-05.csv"), "x")
    Files.writeString(dir.resolve("drops/d_2024-01-01.csv"), "y")
    assert(Sources.resolveDatedDir(spark, dir.toString,
      "drops/d_2024-01-07.csv").endsWith("drops/d_2024-01-05.csv"))
  }
}
