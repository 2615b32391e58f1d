package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.StoreCatalog
import graft.stores.TpchFeatureStore

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("registry splits observables and stratifications by regex") {
    val store = TpchFeatureStore(spark, sfDir,
      Files.createTempDirectory("graft-store-spec").toString)
    assert(store.availableObservables.toSet ==
      Set("n_orders", "n_first_order"))
    assert(store.availableStratifications.toSet ==
      Set("mktsegment", "age_group", "nation"))
    intercept[IllegalArgumentException] {
      store.getFeature("nope", "1995-01-01", "1995-01-31")
    }
    // study-period bounds (reference: min_start_date / max_end_date)
    intercept[IllegalArgumentException] {
      store.getFeature("n_orders", "1980-01-01", "1995-01-31")
    }
    intercept[IllegalArgumentException] {
      store.getFeature("n_orders", "1995-01-01", "2030-01-01")
    }
    intercept[IllegalArgumentException] {
      store.getFeature("n_orders", "1995-02-01", "1995-01-01")
    }
  }

  test("getFeature is compute-if-missing: log-driven range diffing") {
    val path = Files.createTempDirectory("graft-store-spec").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    store.getFeature("n_orders", "1995-01-01", "1995-01-31")
    val logs1 = spark.read.parquet(s"$path/logs").count()
    assert(logs1 == 1)
    // same range again → no recompute
    store.getFeature("n_orders", "1995-01-01", "1995-01-31")
    assert(spark.read.parquet(s"$path/logs").count() == 1)
    // extended range → only the gap is computed
    store.getFeature("n_orders", "1995-01-01", "1995-02-28")
    val logs = spark.read.parquet(s"$path/logs")
      .select("ds_start", "ds_end").collect()
      .map(r => (r.get(0).toString, r.get(1).toString)).toSet
    assert(logs == Set(("1995-01-01", "1995-01-31"),
      ("1995-02-01", "1995-02-28")))
    // returned data equals a direct computation
    val got = store.getFeature("n_orders", "1995-01-01", "1995-02-28")
      .select("o_orderkey").as[Long].collect().toSet
    val direct = graft.core.Intervals.slice(
      Queries.orderIntervals(spark, sfDir), "1995-01-01", "1995-02-28")
      .select("o_orderkey").as[Long].collect().toSet
    assert(got == direct)
  }

  test("out-of-order gap fill keeps later already-computed rows") {
    val path = Files.createTempDirectory("graft-store-spec").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    // compute Feb first, then ask for Jan–Mar: Jan and Mar are gaps
    store.getFeature("n_orders", "1995-02-01", "1995-02-28")
    val got = store.getFeature("n_orders", "1995-01-01", "1995-03-31")
      .select("o_orderkey").as[Long].collect().toSet
    val direct = graft.core.Intervals.slice(
      Queries.orderIntervals(spark, sfDir), "1995-01-01", "1995-03-31")
      .select("o_orderkey").as[Long].collect().toSet
    assert(got == direct, "gap fill must not drop the Feb rows")
  }

  test("store catalog lists and drops tables, scrubbing logs") {
    val path = Files.createTempDirectory("graft-store-spec").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    store.getFeature("n_orders", "1995-01-01", "1995-01-15")
    store.getFeature("mktsegment", "1995-01-01", "1995-01-15")
    assert(StoreCatalog.tables(spark, path).toSet ==
      Set("order_episodes", "customer_segment", "logs"))
    StoreCatalog.drop(spark, path, Some("order.*"))
    assert(StoreCatalog.tables(spark, path).toSet ==
      Set("customer_segment", "logs"))
    val logTables = spark.read.parquet(s"$path/logs")
      .select("table").distinct().collect().map(_.getString(0)).toSet
    assert(logTables == Set("customer_segment"))
    StoreCatalog.drop(spark, path, None)
    assert(StoreCatalog.tables(spark, path).isEmpty)
  }

  test("keyJoinFeatures through the store matches the direct pipeline") {
    val store = TpchFeatureStore(spark, sfDir,
      Files.createTempDirectory("graft-store-spec").toString)
    val viaStore = store
      .keyJoinFeatures("n_orders", Seq("mktsegment"), "1995-01-01", "1995-01-31")
      .orderBy("date", "mktsegment").collect().toSeq
    val direct = graft.core.KeyJoinFeatures(
      graft.core.Intervals.slice(
        Queries.orderIntervals(spark, sfDir), "1995-01-01", "1995-01-31"),
      "n_orders", "key_cust", graft.core.Aggregators.Count,
      Seq(graft.core.Intervals.slice(
        Queries.segmentFeature(spark, sfDir), "1995-01-01", "1995-01-31")),
      Seq("mktsegment"), "1995-01-01", "1995-01-31")
      .orderBy("date", "mktsegment").collect().toSeq
    assert(viaStore == direct)
  }

  test("expression stratification: constants, derived cols, error shape") {
    val store = TpchFeatureStore(spark, sfDir,
      Files.createTempDirectory("graft-store-spec").toString)
    // constant stratification with no feature dependency (reference:
    // "key_join_features works with non-computing stratifications")
    val const = store.keyJoinFeaturesExpr("n_orders",
      Seq("flag" -> lit("test")), "1995-01-01", "1995-01-31")
    assert(const.select("flag").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("test"))
    val plain = store.keyJoinFeatures("n_orders", Seq.empty,
      "1995-01-01", "1995-01-31")
    assert(const.drop("flag").orderBy("date").collect().toSeq ==
      plain.orderBy("date").collect().toSeq)
    // unresolvable stratification reports available variables
    val err = intercept[IllegalArgumentException](
      store.keyJoinFeaturesExpr("n_orders", Seq("x" -> col("bogus")),
        "1995-01-01", "1995-01-31"))
    assert(err.getMessage.contains("Available stratification variables"))
    // stratification names cannot shadow observables
    val err2 = intercept[IllegalArgumentException](
      store.keyJoinFeaturesExpr("n_orders",
        Seq("n_first_order" -> lit(1)), "1995-01-01", "1995-01-31"))
    assert(err2.getMessage.contains("cannot be observables"))
  }

  test("conformance battery passes for both store implementations") {
    import graft.core.StoreConformance
    val tpch = StoreConformance.run(
      () => TpchFeatureStore(spark, sfDir,
        Files.createTempDirectory("graft-conf").toString),
      "1995-01-01", "1995-02-28", midpoint = "1995-01-31")
    assert(tpch.isEmpty, tpch.mkString("; "))
    val semi = StoreConformance.run(
      () => new graft.stores.SemiAggStore(spark, sfDir,
        Files.createTempDirectory("graft-conf").toString),
      "2024-01-05", "2024-01-20", midpoint = "2024-01-10")
    assert(semi.isEmpty, semi.mkString("; "))
  }

  test("registry canonicalizes labels and opens stores by label") {
    import graft.stores.Registry
    assert(Registry.toStoreCase("Google COVID-19") == "GoogleCovid19")
    assert(Registry.toStoreCase("tpch_orders") == "TpchOrders")
    assert(Registry.toStoreCase("semiAgg events") == "SemiAggEvents")
    assert(Registry.exists("tpch orders"))
    assert(!Registry.exists("no such store"))
    val st = Registry.open("tpch_orders", spark, sfDir,
      Files.createTempDirectory("graft-reg").toString)
    assert(st.availableObservables.contains("n_orders"))
    val err = intercept[IllegalArgumentException](
      Registry.open("nope", spark, sfDir, "/tmp/x"))
    assert(err.getMessage.contains("Available:"))
  }

  test("month-partitioned store layout returns the same data") {
    val flat = TpchFeatureStore(spark, sfDir,
      Files.createTempDirectory("graft-store-spec").toString)
    val path = Files.createTempDirectory("graft-store-part").toString
    val part = new graft.core.FeatureStore(spark, sfDir, path,
      flat.dsMap, flat.loaders, partitionByMonth = true)
    val a = part.getFeature("n_orders", "1995-01-01", "1995-02-28")
      .select("o_orderkey").as[Long].collect().toSet
    val b = flat.getFeature("n_orders", "1995-01-01", "1995-02-28")
      .select("o_orderkey").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // layout really is partitioned by month
    val dirs = new java.io.File(s"$path/order_episodes").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("__vm=")))
    // INCREMENTAL update on the partitioned store: the SCD2 merge must
    // see the logical schema (no __vm) or unionByName dies
    val c = part.getFeature("n_orders", "1995-01-01", "1995-04-30")
      .select("o_orderkey").as[Long].collect().toSet
    val d = flat.getFeature("n_orders", "1995-01-01", "1995-04-30")
      .select("o_orderkey").as[Long].collect().toSet
    assert(c == d && c.size > a.size)
  }

  test("compact: fewer valid_from-sorted files, versions and reads intact") {
    val path = Files.createTempDirectory("graft-store-compact").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    // two incremental commits at different transaction times → SCD2
    // history worth preserving
    store.getFeature("n_orders", "1995-01-01", "1995-01-31",
      sliceTs = "2020-01-01 00:00:00")
    store.getFeature("n_orders", "1995-01-01", "1995-03-31",
      sliceTs = "2020-06-01 00:00:00")
    val loader = "order_episodes"
    val before = spark.read.parquet(s"$path/$loader")
      .collect().map(_.toString).sorted
    val filesBefore = store.fileCount(loader)
    val nFiles = store.compact(loader) // default target ≫ table size → 1
    assert(nFiles == 1)
    assert(store.fileCount(loader) == 1)
    assert(filesBefore >= 1)
    // pure layout change: every SCD2 version row survives byte-for-byte
    val after = spark.read.parquet(s"$path/$loader")
      .collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
    // time travel against the FIRST commit still works after compaction
    val early = store.getFeature("n_orders", "1995-01-01", "1995-01-31",
      sliceTs = "2020-01-01 00:00:00").count()
    assert(early > 0)
    // files are internally sorted by valid_from (row-group stat quality)
    val vf = spark.read.parquet(s"$path/$loader")
      .select(spark_partition_id().as("p"), col("valid_from"))
      .collect().map(r => (r.getInt(0), r.getDate(1).toString))
    assert(vf.zipWithIndex.forall { case ((pa, da), i) =>
      i == 0 || vf(i - 1)._1 != pa || vf(i - 1)._2 <= da })
  }

  test("schema evolution on append: widen, version event, time travel") {
    val path = Files.createTempDirectory("graft-store-evolve").toString
    def handler(withQuality: Boolean) = graft.core.FeatureHandler(
      (st, s0, e0) => {
        val base = Seq(
          (1L, "2024-01-01", "2024-03-01", 5L),
          (2L, "2024-01-10", "2024-02-01", 3L))
          .toDF("key_cust", "vf", "vu", "n_widgets")
          .select(col("key_cust"),
            to_date(col("vf")).as("valid_from"),
            to_date(col("vu")).as("valid_until"),
            col("n_widgets"))
        val rows = if (withQuality)
          base.withColumn("quality", col("n_widgets") * 2L) else base
        graft.core.Intervals.slice(rows, s0, e0)
      }, graft.core.Aggregators.Count, "")
    def storeWith(h: graft.core.FeatureHandler) =
      new graft.core.FeatureStore(spark, sfDir, path,
        Seq("n_widgets" -> "widgets"), Map("widgets" -> h),
        storeScope = Some("EvoTest"))
    val (t1, t2) = ("2030-01-01 00:00:00", "2030-02-01 00:00:00")
    val (s, e) = ("2024-01-01", "2024-03-31")
    val v1 = storeWith(handler(withQuality = false))
      .getFeature("n_widgets", s, e, t1)
    assert(!v1.columns.contains("quality") && v1.count() == 2)
    // same table, evolved handler: the new column appears WITHOUT
    // dropping the store (the reference's only path is drop+recompute)
    val st2 = storeWith(handler(withQuality = true))
    val v2 = st2.getFeature("n_widgets", s, e, t2)
    assert(v2.select("quality").as[Long].collect().sorted.toSeq ==
      Seq(6L, 10L))
    // time travel BEFORE the evolution: same rows, new column NULL
    val back = st2.getFeature("n_widgets", s, e, t1)
    assert(back.count() == 2)
    assert(back.filter(col("quality").isNotNull).count() == 0)
    // the evolution is a version event (schema-fingerprinted checksums):
    // every old-shape open version closed at t2, new-shape ones open
    val tbl = spark.read.parquet(s"$path/widgets")
    assert(tbl.filter(col("until_ts") === t2).count() == 2)
    assert(tbl.filter(col("until_ts").isNull).count() == 2)
    assert(tbl.count() == 4)
    // idempotence: re-running the evolved handler at a later slice
    // changes nothing (checksums stable under the new shape)
    st2.getFeature("n_widgets", s, e, "2030-02-15 00:00:00")
    assert(spark.read.parquet(s"$path/widgets").count() == 4)
    // compaction and both slices survive the widened table
    st2.compact("widgets")
    assert(st2.getFeature("n_widgets", s, e, t1)
      .filter(col("quality").isNull).count() == 2)
    assert(st2.getFeature("n_widgets", s, e, t2)
      .filter(col("quality").isNotNull).count() == 2)
    // additive-only: a handler that DROPS a stored column aborts
    val dropH = graft.core.FeatureHandler((st, s0, e0) =>
      Seq((1L, "2024-01-01", "2024-03-01")).toDF("key_cust", "vf", "vu")
        .select(col("key_cust"), to_date(col("vf")).as("valid_from"),
          to_date(col("vu")).as("valid_until")),
      graft.core.Aggregators.Count, "")
    intercept[IllegalArgumentException] {
      storeWith(dropH).getFeature("n_widgets", s, e,
        "2030-03-01 00:00:00")
    }
  }

  test("committer seam: table publishes go through the pluggable committer") {
    val path = Files.createTempDirectory("graft-store-committer").toString
    val proto = TpchFeatureStore(spark, sfDir,
      Files.createTempDirectory("graft-store-committer-proto").toString)
    val publishes = new java.util.concurrent.atomic.AtomicInteger(0)
    val counting = new graft.core.Committer {
      def publish(fs: org.apache.hadoop.fs.FileSystem,
                  dst: org.apache.hadoop.fs.Path,
                  write: String => Unit): Unit = {
        publishes.incrementAndGet()
        graft.core.Committer.Rename.publish(fs, dst, write)
      }
    }
    val store = new graft.core.FeatureStore(spark, sfDir, path,
      proto.dsMap, proto.loaders) {
      override protected def committer: graft.core.Committer = counting
    }
    assert(store.getFeature("n_orders", "1995-01-01", "1995-01-31")
      .count() > 0)
    assert(publishes.get() >= 1)
    // compute-if-missing: an already-covered range publishes nothing
    val before = publishes.get()
    assert(store.getFeature("n_orders", "1995-01-01", "1995-01-31")
      .count() > 0)
    assert(publishes.get() == before)
  }

  test("Rename committer: crash leftovers cleaned, failures keep old table") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val root = Files.createTempDirectory("graft-committer").toString
    val dst = new org.apache.hadoop.fs.Path(s"$root/t")
    def writeMarker(p: String, name: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(p, name), true)
      out.write(name.getBytes); out.close()
    }
    // v1 publish over pre-existing crash garbage (.tmp and .old left by
    // a dead process) succeeds and clears it
    fs.mkdirs(new org.apache.hadoop.fs.Path(dst + ".tmp"))
    writeMarker(dst + ".tmp", "stale")
    graft.core.Committer.Rename.publish(fs, dst,
      tmp => { fs.mkdirs(new org.apache.hadoop.fs.Path(tmp));
        writeMarker(tmp, "v1") })
    assert(fs.exists(new org.apache.hadoop.fs.Path(dst, "v1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst + ".tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst + ".old")))
    // a writer that fails mid-stage leaves the previous version live
    intercept[RuntimeException] {
      graft.core.Committer.Rename.publish(fs, dst,
        _ => throw new RuntimeException("writer died"))
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(dst, "v1")))
    // a successful second publish replaces v1 and leaves no residue
    graft.core.Committer.Rename.publish(fs, dst,
      tmp => { fs.mkdirs(new org.apache.hadoop.fs.Path(tmp));
        writeMarker(tmp, "v2") })
    assert(fs.exists(new org.apache.hadoop.fs.Path(dst, "v2")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst, "v1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst + ".old")))
    // a crash BETWEEN the two renames leaves .old but no dst; the next
    // publish must restore the backup — and keep serving it if its own
    // writer then dies — instead of deleting the only surviving copy
    assert(fs.rename(dst, new org.apache.hadoop.fs.Path(dst + ".old")))
    intercept[RuntimeException] {
      graft.core.Committer.Rename.publish(fs, dst,
        _ => throw new RuntimeException("writer died"))
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(dst, "v2")),
      "dangling .old backup was not restored")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst + ".old")))
  }

  test("backupTo rejects aliased self-backup paths") {
    val path = Files.createTempDirectory("graft-store-alias").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    intercept[IllegalArgumentException] { store.backupTo(path + "/") }
    intercept[IllegalArgumentException] { store.backupTo(path + "/./") }
  }

  test("backupTo: the destination is a working store, nothing recomputes") {
    val path = Files.createTempDirectory("graft-store-bk-src").toString
    val dest = Files.createTempDirectory("graft-store-bk-dst").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    val orig = store.getFeature("n_orders", "1995-01-01", "1995-01-31",
      sliceTs = "2020-01-01 00:00:00")
      .collect().map(_.toString).sorted.toSeq
    val copied = store.backupTo(dest)
    assert(copied.contains("order_episodes"))
    // table bytes equal at the destination
    val loader = "order_episodes"
    val a = spark.read.parquet(s"$path/$loader")
      .collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(s"$dest/$loader")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // the backup opens as a store and serves the same feature WITHOUT
    // recomputing (logs travelled: coverage is already present) — a
    // recompute would republish the table under fresh file names
    def fileNames() = new java.io.File(s"$dest/$loader").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq
    val restored = TpchFeatureStore(spark, sfDir, dest)
    val filesBefore = fileNames()
    val back = restored.getFeature("n_orders", "1995-01-01",
      "1995-01-31", sliceTs = "2020-01-01 00:00:00")
      .collect().map(_.toString).sorted.toSeq
    assert(back == orig)
    assert(fileNames() == filesBefore)
  }

  test("purgeKeys erases every version retroactively, others intact") {
    val path = Files.createTempDirectory("graft-store-purge").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    store.getFeature("n_orders", "1995-01-01", "1995-01-31",
      sliceTs = "2020-01-01 00:00:00")
    val loader = "order_episodes"
    val table = spark.read.parquet(s"$path/$loader")
    val allKeys = table.select("key_cust").distinct()
      .as[Long].collect().sorted
    assert(allKeys.length >= 3)
    val victims = allKeys.take(2)
    val before = table.count()
    val doomed = table
      .filter(col("key_cust").isin(victims.map(Long.box): _*)).count()
    assert(doomed > 0)

    val removed = store.purgeKeys(loader, "key_cust",
      Seq(victims: _*).toDF("key_cust"))
    assert(removed == doomed)
    val after = spark.read.parquet(s"$path/$loader")
    assert(after.count() == before - doomed)
    // erasure is retroactive: time travel to the original commit no
    // longer returns the purged keys, and other keys are untouched
    assert(after.filter(col("key_cust")
      .isin(victims.map(Long.box): _*)).count() == 0)
    val travel = store.getFeature("n_orders", "1995-01-01", "1995-01-31",
      sliceTs = "2020-01-01 00:00:00")
    assert(travel.filter(col("key_cust")
      .isin(victims.map(Long.box): _*)).count() == 0)
    assert(travel.count() > 0)
    // idempotent: purging the same keys again is a counted no-op
    assert(store.purgeKeys(loader, "key_cust",
      Seq(victims: _*).toDF("key_cust")) == 0L)
  }

  test("storeStats reports versions, open rows, files, bytes") {
    val path = Files.createTempDirectory("graft-store-stats").toString
    val store = TpchFeatureStore(spark, sfDir, path)
    store.getFeature("n_orders", "1995-01-01", "1995-01-31")
    val stats = store.storeStats().collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.contains("order_episodes"))
    val r = stats("order_episodes")
    assert(r.getLong(1) > 0)            // n_versions
    assert(r.getLong(2) == r.getLong(1)) // all open after first fill
    assert(r.getLong(3) >= 1)            // n_files
    assert(r.getLong(4) > 0)             // bytes
  }

  test("mismatched aggregators across features are rejected") {
    val store = TpchFeatureStore(spark, sfDir,
      Files.createTempDirectory("graft-store-spec").toString)
    // all TpchFeatureStore features share Count, so force the error path
    // by asking for an observable that is not one
    intercept[IllegalArgumentException] {
      store.keyJoinFeatures("mktsegment", Seq.empty, "1995-01-01", "1995-01-31")
    }
  }
}
