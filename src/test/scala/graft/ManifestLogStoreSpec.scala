package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core._
import graft.stores.TpchFeatureStore

/** ManifestLog as a SUPPORTED store mode (r13 verdict task 3): the
  * full store battery — conformance, backup+restore with coverage,
  * compaction, purge, schema evolution, catalog management, streaming
  * ingest — over a store whose every table publish goes through the
  * transactional manifest-log committer. Rename stays the DEFAULT
  * (plain dirs external engines read directly — see
  * FeatureStore.committer's Scaladoc); this suite is what makes the
  * opt-in supported rather than experimental. */
class ManifestLogStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val M = Committer.ManifestLog

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("conformance battery passes over ManifestLog-backed stores") {
    val tpch = StoreConformance.run(
      () => TpchFeatureStore(spark, sfDir, tmp("graft-mlog-conf"),
        commitProtocol = M),
      "1995-01-01", "1995-02-28", midpoint = "1995-01-31")
    assert(tpch.isEmpty, tpch.mkString("; "))
    val semi = StoreConformance.run(
      () => new graft.stores.SemiAggStore(spark, sfDir,
        tmp("graft-mlog-conf"), commitProtocol = M),
      "2024-01-05", "2024-01-20", midpoint = "2024-01-10")
    assert(semi.isEmpty, semi.mkString("; "))
  }

  test("backup + restore: coverage log travels on the PLAIN path, " +
    "nothing recomputes, post-restore appends extend the same log") {
    val path = tmp("graft-mlog-bk-src")
    val dest = tmp("graft-mlog-bk-dst")
    val store = TpchFeatureStore(spark, sfDir, path, commitProtocol = M)
    val loader = "order_episodes"
    val orig = store.getFeature("n_orders", "1995-01-01", "1995-01-31",
        sliceTs = "2020-01-01 00:00:00")
      .collect().map(_.toString).sorted.toSeq
    store.backupTo(dest)
    // the coverage log must be a PLAIN parquet dir at the destination
    // (publishing it through ManifestLog put it where the plain-path
    // read never looks — the restored store silently recomputed)
    assert(new java.io.File(s"$dest/logs").isDirectory)
    assert(!new java.io.File(s"$dest/logs.mlog").exists())
    // the loader TABLE travels through the committer (manifest layout)
    assert(new java.io.File(s"$dest/$loader.mlog").isDirectory)
    assert(!new java.io.File(s"$dest/$loader").exists())
    val restored = TpchFeatureStore(spark, sfDir, dest,
      commitProtocol = M)
    val genBefore = restored.tableGen(loader)
    val back = restored.getFeature("n_orders", "1995-01-01",
        "1995-01-31", sliceTs = "2020-01-01 00:00:00")
      .collect().map(_.toString).sorted.toSeq
    assert(back == orig)
    // coverage was visible → no recompute → no new generation
    assert(restored.tableGen(loader) == genBefore,
      "restored store recomputed despite backed-up coverage")
    // a post-restore append extends the SAME plain log (no shadow
    // dir): the gap range computes once, then full coverage holds
    restored.getFeature("n_orders", "1995-01-01", "1995-02-28",
      sliceTs = "2020-01-01 00:00:00")
    val genAfterGap = restored.tableGen(loader)
    assert(genAfterGap == genBefore + 1)
    restored.getFeature("n_orders", "1995-01-01", "1995-02-28",
      sliceTs = "2020-01-01 00:00:00")
    assert(restored.tableGen(loader) == genAfterGap,
      "extended range recomputed twice — appended coverage not seen")
    val ranges = spark.read.parquet(s"$dest/logs")
      .select("ds_start", "ds_end").collect()
      .map(r => (r.get(0).toString, r.get(1).toString)).toSet
    assert(ranges == Set(("1995-01-01", "1995-01-31"),
      ("1995-02-01", "1995-02-28")))
  }

  test("schema evolution on append: widen, version event, time travel") {
    val path = tmp("graft-mlog-evolve")
    def handler(withQuality: Boolean) = FeatureHandler(
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
        Intervals.slice(rows, s0, e0)
      }, Aggregators.Count, "")
    def storeWith(h: FeatureHandler) =
      new FeatureStore(spark, sfDir, path,
        Seq("n_widgets" -> "widgets"), Map("widgets" -> h),
        storeScope = Some("MlogEvoTest"), commitProtocol = M)
    val (t1, t2) = ("2030-01-01 00:00:00", "2030-02-01 00:00:00")
    val (s, e) = ("2024-01-01", "2024-03-31")
    val v1 = storeWith(handler(withQuality = false))
      .getFeature("n_widgets", s, e, t1)
    assert(!v1.columns.contains("quality") && v1.count() == 2)
    val st2 = storeWith(handler(withQuality = true))
    val v2 = st2.getFeature("n_widgets", s, e, t2)
    assert(v2.select("quality").as[Long].collect().sorted.toSeq ==
      Seq(6L, 10L))
    // time travel BEFORE the evolution: same rows, new column NULL
    val back = st2.getFeature("n_widgets", s, e, t1)
    assert(back.count() == 2)
    assert(back.filter(col("quality").isNotNull).count() == 0)
    // reads resolve through the committer — the logical dir never
    // exists on disk under ManifestLog
    assert(!new java.io.File(s"$path/widgets").exists())
    val tbl = st2.versionedTable("widgets")
    assert(tbl.filter(col(Scd2.UntilTs) === t2).count() == 2)
    assert(tbl.filter(col(Scd2.UntilTs).isNull).count() == 2)
    assert(tbl.count() == 4)
  }

  test("compaction + purge keep serving through the manifest head") {
    val path = tmp("graft-mlog-compact")
    val store = TpchFeatureStore(spark, sfDir, path, commitProtocol = M)
    store.getFeature("n_orders", "1995-01-01", "1995-01-31",
      sliceTs = "2020-01-01 00:00:00")
    val loader = "order_episodes"
    val before = store.versionedTable(loader)
      .collect().map(_.toString).sorted.toSeq
    val gen0 = store.tableGen(loader)
    val nFiles = store.compact(loader)
    assert(store.tableGen(loader) == gen0 + 1)
    val after = store.versionedTable(loader)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction changed table contents")
    assert(store.fileCount(loader) == nFiles)
    // purge: retroactive erasure publishes the next generation
    val victim = store.versionedTable(loader)
      .select(col("key_cust")).as[Long].head()
    val removed = store.purgeKeys(loader, "key_cust",
      Seq(victim).toDF("key_cust"))
    assert(removed > 0)
    assert(store.tableGen(loader) == gen0 + 2)
    assert(store.versionedTable(loader)
      .filter(col("key_cust") === victim).count() == 0)
  }

  test("StoreCatalog lists and drops manifest-log tables (logical dir " +
    "never exists on disk)") {
    val path = tmp("graft-mlog-catalog")
    val store = TpchFeatureStore(spark, sfDir, path, commitProtocol = M)
    store.getFeature("n_orders", "1995-01-01", "1995-01-31")
    store.getFeature("mktsegment", "1995-01-01", "1995-01-31")
    val listed = StoreCatalog.tables(spark, path)
    assert(listed.contains("order_episodes") &&
      listed.contains("customer_segment"), listed.mkString(", "))
    StoreCatalog.drop(spark, path, Some("order_.*"))
    val left = StoreCatalog.tables(spark, path)
    assert(!left.contains("order_episodes"))
    assert(left.contains("customer_segment"))
    assert(!new java.io.File(s"$path/order_episodes.mlog").exists())
    assert(!new java.io.File(s"$path/order_episodes.mdata").exists())
    // the dropped table's coverage rows are scrubbed; the survivor's stay
    val logTables = spark.read.parquet(s"$path/logs")
      .select("table").as[String].collect().toSet
    assert(logTables == Set("customer_segment"))
  }

  test("VERSION AS OF: generation snapshot reads inside the retention " +
    "window; Rename serves only the head; unretained gens throw") {
    val path = tmp("graft-mlog-asof")
    def rows(k: Long, v: Long) =
      Seq((k, v, "2020-01-05", "2020-01-10"))
        .toDF("key_x", "n_val", "vf", "vu")
        .select(col("key_x"), col("n_val"),
          to_date(col("vf")).as("valid_from"),
          to_date(col("vu")).as("valid_until"))
    val store = new FeatureStore(spark, "unused", path,
      dsMap = Seq("n_val" -> "ld"),
      loaders = Map("ld" -> FeatureHandler(
        compute = (_, _, _) => rows(1L, 10L),
        keyJoin = Aggregators.Sum, feature = "n_val")),
      commitProtocol = M)
    store.appendCommit("ld", rows(1L, 10L), "2024-01-01 00:00:00")
    store.appendCommit("ld", rows(2L, 20L), "2024-02-01 00:00:00")
    store.appendCommit("ld", rows(3L, 30L), "2024-03-01 00:00:00")
    assert(store.tableGenerations("ld") == Seq(1L, 2L, 3L))
    def keysAt(g: Long) = store.versionedTableAt("ld", g)
      .select("key_x").as[Long].collect().toSet
    assert(keysAt(1L) == Set(1L))
    assert(keysAt(2L) == Set(1L, 2L))
    assert(keysAt(3L) == Set(1L, 2L, 3L))
    // generation snapshots capture PHYSICAL rewrites SCD2 timestamps
    // do not: after a purge, the pre-purge generation still serves
    // the erased key (until it ages out of the window)
    store.purgeKeys("ld", "key_x", Seq(1L).toDF("key_x"))
    assert(keysAt(4L) == Set(2L, 3L))
    assert(keysAt(3L) == Set(1L, 2L, 3L))
    val err = intercept[IllegalArgumentException] {
      store.versionedTableAt("ld", 99L)
    }
    assert(err.getMessage.contains("not retained"))
    // Rename committer: only the head generation is physically
    // readable (the swap destroys the previous version)
    val rstore = new FeatureStore(spark, "unused", tmp("graft-ren-asof"),
      dsMap = Seq("n_val" -> "ld"),
      loaders = Map("ld" -> FeatureHandler(
        compute = (_, _, _) => rows(1L, 10L),
        keyJoin = Aggregators.Sum, feature = "n_val")))
    rstore.appendCommit("ld", rows(1L, 10L), "2024-01-01 00:00:00")
    rstore.appendCommit("ld", rows(2L, 20L), "2024-02-01 00:00:00")
    assert(rstore.tableGenerations("ld") == Seq(2L))
    assert(rstore.versionedTableAt("ld", 2L)
      .select("key_x").as[Long].collect().toSet == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      rstore.versionedTableAt("ld", 1L)
    }
  }

  test("streaming SCD2 ingest commits per batch through the manifest " +
    "log, idempotent under replay") {
    implicit val sqlCtx = spark.sqlContext
    val store = TpchFeatureStore(spark, sfDir, tmp("graft-mlog-ingest"),
      commitProtocol = M)
    val loader = "feed"
    def featRow(key: Long, v: String, from: String) =
      (key, v, java.sql.Date.valueOf(from),
        null.asInstanceOf[java.sql.Date])
    val ms = MemoryStream[(Long, String, java.sql.Date, java.sql.Date)]
    val rows = ms.toDF().toDF("key_cust", "segment", "valid_from",
      "valid_until")
    val q = store.ingestStream(loader, rows,
      tmp("graft-mlog-ingest-ckpt"),
      tsOfBatch = id => f"2020-01-01 00:00:${id}%02d")
    try {
      ms.addData(featRow(1L, "A", "2024-01-01"),
        featRow(2L, "B", "2024-01-01"))
      q.processAllAvailable()
      assert(store.versionedTable(loader).count() == 2)
      assert(store.tableGen(loader) == 1L)
      // replayed row = checksum no-op; new row = fresh version
      ms.addData(featRow(3L, "C", "2024-02-01"),
        featRow(1L, "A", "2024-01-01"))
      q.processAllAvailable()
      val table = store.versionedTable(loader)
      assert(table.count() == 3)
      val ts1 = table.filter(col("key_cust") === 1L)
        .select(col(Scd2.FromTs).cast("string")).as[String].head()
      assert(ts1 == "2020-01-01 00:00:00")
      val atB0 = Scd2.sliceAt(table, "2020-01-01 00:00:00")
        .select("key_cust").as[Long].collect().toSet
      assert(atB0 == Set(1L, 2L))
    } finally q.stop()
  }

  test("in-place adoption of a Rename-written store: zero-copy, reads " +
    "byte-identical, CAS + retention + VERSION AS OF work after, " +
    "legacy dir never GC'd") {
    val path = tmp("graft-mlog-adopt")
    def rows(k: Long, v: Long) =
      Seq((k, v, "2020-01-05", "2020-01-10"))
        .toDF("key_x", "n_val", "vf", "vu")
        .select(col("key_x"), col("n_val"),
          to_date(col("vf")).as("valid_from"),
          to_date(col("vu")).as("valid_until"))
    def mkStore(c: Committer) = new FeatureStore(spark, "unused", path,
      dsMap = Seq("n_val" -> "ld"),
      loaders = Map("ld" -> FeatureHandler(
        compute = (_, _, _) => rows(1L, 10L),
        keyJoin = Aggregators.Sum, feature = "n_val")),
      commitProtocol = c)
    // a deployed Rename store with commit history (.gens head = 2)
    val rstore = mkStore(Committer.Rename)
    rstore.appendCommit("ld", rows(1L, 10L), "2024-01-01 00:00:00")
    rstore.appendCommit("ld", rows(2L, 20L), "2024-02-01 00:00:00")
    val tableP = new org.apache.hadoop.fs.Path(s"$path/ld")
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(): Seq[(String, Long, Long)] = {
      def rec(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
        fs.listStatus(p).toSeq.flatMap(s =>
          if (s.isDirectory) rec(s.getPath)
          else Seq((s.getPath.toString, s.getLen,
            s.getModificationTime)))
      rec(tableP).sortBy(_._1)
    }
    val preFiles = listing()
    val preRows = spark.read.parquet(tableP.toString)
      .collect().map(_.toString).sorted.toSeq
    // adopt: no data copy, generation numbering continues .gens
    val g = M.adopt(fs, tableP)
    assert(g == 3L, s"adopted at $g, expected .gens head 2 + 1")
    assert(M.adopt(fs, tableP) == 3L, "re-adopt must be a no-op")
    assert(listing() == preFiles, "adoption touched the data files")
    // the ManifestLog store over the same path reads byte-identically
    val mstore = mkStore(M)
    assert(mstore.tableGen("ld") == 3L)
    assert(spark.read.parquet(tableP.toString)
      .collect().map(_.toString).sorted.toSeq == preRows)
    assert(mstore.versionedTableAt("ld", 3L)
      .collect().map(_.toString).sorted.toSeq == preRows)
    // a post-adoption commit is a normal CAS snapshot publish: new
    // data lands in .mdata, the legacy dir is never rewritten
    mstore.appendCommit("ld", rows(3L, 30L), "2024-03-01 00:00:00")
    assert(mstore.tableGen("ld") == 4L)
    assert(listing() == preFiles,
      "post-adoption commit rewrote the legacy dir")
    assert(new java.io.File(s"$path/ld.mdata").isDirectory)
    assert(mstore.versionedTableAt("ld", 4L)
      .select("key_x").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(mstore.versionedTableAt("ld", 3L)
      .collect().map(_.toString).sorted.toSeq == preRows,
      "adopted generation no longer serves the original files")
    // stale CAS after adoption is refused without touching anything
    intercept[StaleWriteException] {
      M.publishCas(fs, tableP, expectedGen = 3L, _ => ())
    }
    assert(mstore.tableGen("ld") == 4L)
    // retention: age the adopt manifest out of the window — the
    // manifest goes, the LEGACY DIRECTORY stays (only .mdata children
    // are ever GC'd)
    (4L until 12L).foreach { eg =>
      M.publishCas(fs, tableP, eg,
        p => rows(9L, 90L).write.parquet(p))
    }
    assert(M.retainedGens(fs, tableP) == (5L to 12L))
    assert(M.resolveGen(fs, tableP, 3L).isEmpty,
      "adopt generation should have aged out")
    assert(fs.exists(tableP), "legacy dir must never be GC'd")
    assert(listing() == preFiles, "retention touched the legacy dir")
  }

  test("column rename: metadata-only commit, read-back, pre/post time " +
    "travel, merge + compaction across the rename, adopt-then-rename, " +
    "Rename committer refuses, GC keeps referenced data") {
    val path = tmp("graft-mlog-rename")
    def rows(k: Long, v: Long) =
      Seq((k, v, "2020-01-05", "2020-01-10"))
        .toDF("key_x", "n_val", "vf", "vu")
        .select(col("key_x"), col("n_val"),
          to_date(col("vf")).as("valid_from"),
          to_date(col("vu")).as("valid_until"))
    def mkStore(c: Committer, p: String = path) =
      new FeatureStore(spark, "unused", p,
        dsMap = Seq("n_val" -> "ld"),
        loaders = Map("ld" -> FeatureHandler(
          compute = (_, _, _) => rows(1L, 10L),
          keyJoin = Aggregators.Sum, feature = "n_val")),
        commitProtocol = c)
    val store = mkStore(M)
    store.appendCommit("ld", rows(1L, 10L), "2024-01-01 00:00:00")
    store.appendCommit("ld", rows(2L, 20L), "2024-02-01 00:00:00")
    val tableP = new org.apache.hadoop.fs.Path(s"$path/ld")
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataBefore = M.resolve(fs, tableP).get.toString
    val valsBefore = store.versionedTable("ld")
      .select("key_x", "n_val").as[(Long, Long)].collect().toSet

    // metadata-only rename: gen advances, data dir does NOT move
    val g = store.renameDataColumn("ld", "n_val", "n_value")
    assert(g == 3L)
    assert(M.resolve(fs, tableP).get.toString == dataBefore,
      "rename moved data")
    val renamed = store.versionedTable("ld")
    assert(renamed.columns.contains("n_value") &&
      !renamed.columns.contains("n_val"))
    assert(renamed.select("key_x", "n_value").as[(Long, Long)]
      .collect().toSet == valsBefore)

    // time travel: pre-rename generations keep the OLD logical name
    assert(store.versionedTableAt("ld", 2L).columns.contains("n_val"))
    assert(!store.versionedTableAt("ld", 2L).columns.contains("n_value"))
    assert(store.versionedTableAt("ld", 3L).columns.contains("n_value"))

    // validations: unknown source, collision, system columns
    intercept[IllegalArgumentException] {
      store.renameDataColumn("ld", "nope", "x") }
    intercept[IllegalArgumentException] {
      store.renameDataColumn("ld", "n_value", "key_x") }
    intercept[IllegalArgumentException] {
      store.renameDataColumn("ld", Scd2.Checksum, "x") }

    // an SCD2 merge AFTER the rename writes logical names physically
    // and resets the map — contents stay addressable as n_value
    store.appendCommit("ld",
      rows(3L, 30L).withColumnRenamed("n_val", "n_value"),
      "2024-03-01 00:00:00")
    assert(store.tableGen("ld") == 4L)
    assert(M.columnMap(fs, tableP).isEmpty,
      "a data rewrite should reset the mapping to identity")
    assert(store.versionedTable("ld")
      .select("key_x", "n_value").as[(Long, Long)].collect().toSet ==
      valsBefore + ((3L, 30L)))

    // chained rename then compaction across it
    store.renameDataColumn("ld", "n_value", "n_widgets")
    val nFiles = store.compact("ld")
    assert(nFiles >= 1)
    val compacted = store.versionedTable("ld")
    assert(compacted.columns.contains("n_widgets"))
    assert(compacted.select("key_x", "n_widgets").as[(Long, Long)]
      .collect().toSet == valsBefore + ((3L, 30L)))

    // GC reference guard: a rename manifest's shared data dir survives
    // while the manifest is retained, even past its own gen prefix
    val probeP = new org.apache.hadoop.fs.Path(s"$path/probe")
    M.publishCas(fs, probeP, 0L, p => rows(1L, 1L).write.parquet(p))
    M.renameColumn(fs, probeP, "n_val", "n_v2") // gen 2 reuses gen 1 data
    (2L until 10L).foreach { eg =>
      M.publishCas(fs, probeP, eg,
        p => rows(9L, 9L).write.parquet(p))
    }
    // gen 2 (the rename) is the oldest retained; its data dir has
    // prefix 1 (aged out) but must survive the reference
    assert(M.retainedGens(fs, probeP).head == 3L ||
      M.retainedGens(fs, probeP).contains(2L))
    M.retainedGens(fs, probeP).foreach { rg =>
      val df = spark.read.parquet(M.resolveGen(fs, probeP, rg).get.toString)
      assert(df.count() >= 1, s"gen $rg data GC'd from under its manifest")
    }

    // adopt-then-rename: a Rename-written table upgrades then renames
    val path2 = tmp("graft-mlog-adoptrename")
    val rstore = mkStore(Committer.Rename, path2)
    rstore.appendCommit("ld", rows(1L, 10L), "2024-01-01 00:00:00")
    val tableP2 = new org.apache.hadoop.fs.Path(s"$path2/ld")
    M.adopt(fs, tableP2)
    val mstore2 = mkStore(M, path2)
    mstore2.renameDataColumn("ld", "n_val", "n_value")
    assert(mstore2.versionedTable("ld").columns.contains("n_value"))
    assert(mstore2.versionedTable("ld")
      .select("key_x", "n_value").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L)))

    // the Rename committer refuses with a clear error
    val plain = mkStore(Committer.Rename, tmp("graft-ren-refuse"))
    plain.appendCommit("ld", rows(1L, 10L), "2024-01-01 00:00:00")
    val err = intercept[UnsupportedOperationException] {
      plain.renameDataColumn("ld", "n_val", "n_value")
    }
    assert(err.getMessage.contains("ManifestLog"))
  }
}
