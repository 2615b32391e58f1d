package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.core.{Aggregators, Committer, FeatureHandler, FeatureStore,
  StaleWriteException}

/** Multi-writer optimistic concurrency: the generation CAS that makes
  * two drivers racing one store SAFE — the loser of a commit race gets
  * a retryable [[StaleWriteException]] instead of silently clobbering
  * the winner (the lost-update hole a bare marker-file lock leaves when
  * a live writer's lock is wrongly broken as stale). */
class CasCommitSpec extends SparkSpec {
  import spark.implicits._

  private def hfs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("commitGen kernel: N racing writers each land exactly once per " +
    "won generation; losers observe stale and retry") {
    val dst = new Path(
      Files.createTempDirectory("graft-cas").toString + "/tbl")
    val writers = 4
    val perWriter = 20
    val stales = new AtomicInteger(0)
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to writers).map { _ =>
      new Thread(() => {
        try {
          var committed = 0
          while (committed < perWriter) {
            val g = Committer.currentGen(hfs, dst)
            try {
              Committer.commitGen(hfs, dst, g)
              wins.add(g + 1); committed += 1
            }
            catch { case _: StaleWriteException => stales.incrementAndGet() }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errors.isEmpty, s"writer died: ${Option(errors.peek())}")
    // every one of the 80 commits won a DISTINCT generation (withdrawn
    // head-check claims may leave numbered holes, so the final gen can
    // exceed 80 — distinctness of wins is the lost-update invariant)
    val wonGens = scala.jdk.CollectionConverters
      .CollectionHasAsScala(wins).asScala.map(_.longValue()).toSeq
    assert(wonGens.size == writers * perWriter)
    assert(wonGens.distinct.size == wonGens.size,
      "two writers won the same generation — lost update possible")
    assert(Committer.currentGen(hfs, dst) == wonGens.max)
    // the race was real: at least one writer lost at least one round
    assert(stales.get() > 0, "no contention observed — race not exercised")
  }

  test("commitGen CROSS-PROCESS: two real JVMs racing one table — " +
    "all wins distinct, losers retry (FS marker is the only exclusion)") {
    val perWriter = 20
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // this JVM's class path IS the test class path (classes dirs +
    // spark jars) — reuse it verbatim (the Bench.freshJvmMin posture)
    // instead of hardcoding layout-specific paths
    val cp = System.getProperty("java.class.path")
    // slow JVM startup can serialize an attempt (no overlap at all) —
    // retry the whole race until contention materializes; the
    // correctness invariants are asserted on EVERY attempt. 6 attempts:
    // under a fully loaded test machine (72 parallel suites) 3 was
    // observed to serialize every race (r17 full-gate flake)
    val contended = (1 to 6).exists { _ =>
      val dir = Files.createTempDirectory("graft-cas-jvm")
      val dst = s"$dir/tbl"
      val goFile = s"$dir/go"
      def probe() = new ProcessBuilder(
          javaBin, "-cp", cp, "graft.tools.CasProbe",
          dst, perWriter.toString, goFile)
        .redirectErrorStream(true).start()
      val ps = Seq(probe(), probe())
      Files.createFile(new java.io.File(goFile).toPath) // start barrier
      val outs = ps.map { p =>
        val lines = scala.io.Source.fromInputStream(p.getInputStream)
          .getLines().toList
        assert(p.waitFor(90, TimeUnit.SECONDS) && p.exitValue() == 0,
          s"probe failed:\n${lines.mkString("\n")}")
        lines
      }
      val wins = outs.map(_.collect { case s if s.startsWith("WIN ") =>
        s.stripPrefix("WIN ").trim.toLong })
      assert(wins.forall(_.size == perWriter))
      val all = wins.flatten
      assert(all.distinct.size == all.size,
        s"two JVMs won the same generation: ${all.sorted}")
      assert(Committer.currentGen(hfs, new Path(dst)) == all.max)
      outs.exists(_.contains("STALE"))
    }
    assert(contended,
      "no cross-process contention observed in 3 attempts")
  }

  test("commitGen: a writer stalled past the GC horizon cannot " +
    "re-create a GC'd marker and spuriously win the CAS") {
    val dst = new Path(
      Files.createTempDirectory("graft-cas-gc").toString + "/tbl")
    // advance the table to gen 20 (gcKeep = 8 ⇒ markers ≤ 12 GC'd)
    (0L until 20L).foreach(g => Committer.commitGen(hfs, dst, g))
    assert(Committer.currentGen(hfs, dst) == 20L)
    // a writer that read gen 5 long ago wakes up: marker 6 is GC'd,
    // so its create-if-absent SUCCEEDS — the head-check must refuse
    val e = intercept[StaleWriteException] {
      Committer.commitGen(hfs, dst, 5L)
    }
    assert(e.getMessage.contains("GC horizon"))
    // the bogus claim was withdrawn and the head is untouched
    assert(Committer.currentGen(hfs, dst) == 20L)
    assert(!hfs.exists(new Path(dst.toString + ".gens/6")))
    // a CORRECT head claim still lands afterwards
    Committer.commitGen(hfs, dst, 20L)
    assert(Committer.currentGen(hfs, dst) == 21L)
  }

  // ---- ManifestLog: the transactional committer (claim IS publish) ----

  private val M = Committer.ManifestLog

  private def writeDir(path: String, content: String): Unit = {
    val p = new Path(path)
    hfs.mkdirs(p)
    val out = hfs.create(new Path(p, "part-0.txt"), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
  private def readDir(p: Path): String = {
    val in = hfs.open(new Path(p, "part-0.txt"))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  test("ManifestLog: gen and data flip atomically — the " +
    "capture-gen-inside-the-publish-window lost update is REFUSED") {
    val dst = new Path(
      Files.createTempDirectory("graft-mlog").toString + "/tbl")
    M.publishCas(hfs, dst, 0L, d => writeDir(d, "v1"))
    assert(M.currentGen(hfs, dst) == 1L)
    assert(readDir(M.resolve(hfs, dst).get) == "v1")
    // Writer B interleaves at the most dangerous instant: A's new
    // version fully staged, a hair before A's commit. Under the
    // marker-file CAS this was THE window — B captured A's freshly
    // claimed gen while still reading the pre-commit data, merged
    // from stale rows, and committed gen+2 over A's update silently.
    var bGen = -1L
    var bData: String = null
    M.publishCas(hfs, dst, 1L, d => {
      writeDir(d, "v2")
      bGen = M.currentGen(hfs, dst)
      bData = readDir(M.resolve(hfs, dst).get)
    })
    // under ManifestLog, B saw a CONSISTENT old world: gen 1 AND v1
    assert(bGen == 1L, s"B captured gen $bGen inside A's publish")
    assert(bData == "v1")
    assert(readDir(M.resolve(hfs, dst).get) == "v2")
    // ...so B's publish at its captured gen is refused, not lost
    intercept[StaleWriteException] {
      M.publishCas(hfs, dst, bGen, d => writeDir(d, "v-lost"))
    }
    assert(M.currentGen(hfs, dst) == 2L)
    assert(readDir(M.resolve(hfs, dst).get) == "v2",
      "the refused writer touched the live table")
  }

  test("ManifestLog: a crash after staging leaves gen AND data " +
    "untouched; the orphan staging dir ages past the GC horizon") {
    val dst = new Path(
      Files.createTempDirectory("graft-mlog-crash").toString + "/tbl")
    M.publishCas(hfs, dst, 0L, d => writeDir(d, "v1"))
    val boom = intercept[RuntimeException] {
      M.publishCas(hfs, dst, 1L, d => {
        writeDir(d, "half-written"); throw new RuntimeException("crash")
      })
    }
    assert(boom.getMessage == "crash")
    // nothing observable changed — no manifest, old data served
    assert(M.currentGen(hfs, dst) == 1L)
    assert(readDir(M.resolve(hfs, dst).get) == "v1")
    // the orphan staging dir exists (invisible) and is GC'd once its
    // generation prefix falls 8 behind the head
    val mdata = new Path(dst.toString + ".mdata")
    def dataDirs() = hfs.listStatus(mdata).map(_.getPath.getName).toSet
    val orphan = dataDirs().filter(_.startsWith("00000000000000000002"))
    assert(orphan.size == 1, s"expected one orphan: ${dataDirs()}")
    var g = 1L
    while (g < 10L) { M.publishCas(hfs, dst, g, d =>
      writeDir(d, s"v${g + 1}")); g += 1 }
    assert(!dataDirs().contains(orphan.head),
      "crashed staging dir survived the GC horizon")
    assert(readDir(M.resolve(hfs, dst).get) == "v10")
  }

  test("ManifestLog: N racing writers each land exactly once per won " +
    "generation; every loser is refused, nothing is lost") {
    val dst = new Path(
      Files.createTempDirectory("graft-mlog-race").toString + "/tbl")
    val writers = 4
    val perWriter = 10
    val stales = new AtomicInteger(0)
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to writers).map { w =>
      new Thread(() => {
        try {
          var committed = 0
          while (committed < perWriter) {
            val g = M.currentGen(hfs, dst)
            try {
              M.publishCas(hfs, dst, g, d => writeDir(d, s"w$w-g${g + 1}"))
              wins.add(g + 1); committed += 1
            } catch {
              case _: StaleWriteException => stales.incrementAndGet()
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"writer died: ${Option(errors.peek())}")
    val wonGens = scala.jdk.CollectionConverters
      .CollectionHasAsScala(wins).asScala.map(_.longValue()).toSeq
    assert(wonGens.size == writers * perWriter)
    assert(wonGens.distinct.size == wonGens.size,
      "two writers won the same generation — lost update possible")
    assert(M.currentGen(hfs, dst) == wonGens.max)
    // the winner of the LAST generation is the data on disk
    assert(readDir(M.resolve(hfs, dst).get).endsWith(s"g${wonGens.max}"))
    assert(stales.get() > 0, "no contention observed — race not exercised")
  }

  test("ManifestLog: a stalled writer's below-GC-horizon manifest " +
    "claim is withdrawn and refused") {
    val dst = new Path(
      Files.createTempDirectory("graft-mlog-gc").toString + "/tbl")
    var g = 0L
    while (g < 20L) { M.publishCas(hfs, dst, g, d =>
      writeDir(d, s"v${g + 1}")); g += 1 }
    assert(M.currentGen(hfs, dst) == 20L)
    // a writer that read gen 5 long ago wakes up: manifest 6 was GC'd,
    // so its atomic create SUCCEEDS — resolve reads the HIGHEST
    // manifest, so without the head check this commit would be
    // silently invisible (a lost update for the stalled writer)
    val e = intercept[StaleWriteException] {
      M.publishCas(hfs, dst, 5L, d => writeDir(d, "stale"))
    }
    assert(e.getMessage.contains("GC horizon"))
    assert(M.currentGen(hfs, dst) == 20L)
    assert(readDir(M.resolve(hfs, dst).get) == "v20")
    // and a correct head claim still lands afterwards
    M.publishCas(hfs, dst, 20L, d => writeDir(d, "v21"))
    assert(readDir(M.resolve(hfs, dst).get) == "v21")
  }

  test("FeatureStore over ManifestLog: ingest, merge, time travel, " +
    "purge and stats run unchanged through the resolve seam") {
    val p = Files.createTempDirectory("graft-mlog-store").toString + "/s"
    def rows(k: Long, v: Long, vf: String, vu: String) =
      Seq((k, v, vf, vu)).toDF("key_x", "n_val", "vf", "vu")
        .select(col("key_x"), col("n_val"),
          to_date(col("vf")).as("valid_from"),
          to_date(col("vu")).as("valid_until"))
    val store = new FeatureStore(spark, "unused", p,
      dsMap = Seq("n_val" -> "ld"),
      loaders = Map("ld" -> FeatureHandler(
        compute = (_, _, _) => rows(1L, 10L, "2020-01-05", "2020-01-10"),
        keyJoin = Aggregators.Sum, feature = "n_val"))) {
      override protected def committer: Committer = Committer.ManifestLog
    }
    store.appendCommit("ld", rows(1L, 10L, "2020-01-05", "2020-01-10"),
      "2024-01-01 00:00:00")
    store.appendCommit("ld", rows(1L, 99L, "2020-01-05", "2020-01-10"),
      "2024-02-01 00:00:00")
    assert(store.tableGen("ld") == 2L)
    // the table's logical address never exists on disk — only the
    // committer can resolve it
    assert(!hfs.exists(new Path(s"$p/ld")))
    def openVals(ts: String) = graft.core.Scd2
      .sliceAt(store.versionedTable("ld"), ts)
      .select("n_val").as[Long].collect().toSet
    assert(openVals("2024-01-15 00:00:00") == Set(10L)) // time travel
    // appendCommit is an append-style feed: both rows are current
    assert(openVals("2024-03-01 00:00:00") == Set(10L, 99L))
    val stats = store.storeStats().select("loader", "n_versions")
      .as[(String, Long)].collect().toMap
    assert(stats("ld") == 2L)
    assert(store.purgeKeys("ld", "key_x",
      Seq(1L).toDF("key_x")) == 2L)
    assert(store.versionedTable("ld").count() == 0L)
    assert(store.tableGen("ld") == 3L)
    // compact on a manifest table publishes a new generation
    store.appendCommit("ld", rows(2L, 5L, "2020-02-01", "2020-02-03"),
      "2024-03-01 00:00:00")
    store.compact("ld")
    assert(store.versionedTable("ld").count() == 1L)
  }

  test("two drivers, broken stale lock: loser's publish is refused, " +
    "retry lands BOTH commits") {
    val dir = Files.createTempDirectory("graft-cas-race").toString
    // same directory on disk, but distinct KeyedLocks keys (the JVM
    // mutex keys on the RAW path string; '//' collapses in Path) — so
    // the two stores exclude each other ONLY through the FS marker
    // file, exactly like two drivers on two machines
    val pathA = s"$dir/store"
    val pathB = s"$dir//store"
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val computes = new AtomicInteger(0)
    def rows(k: Long, v: Long, vf: String, vu: String) =
      Seq((k, v, vf, vu)).toDF("key_x", "n_val", "vf", "vu")
        .select(col("key_x"), col("n_val"),
          to_date(col("vf")).as("valid_from"),
          to_date(col("vu")).as("valid_until"))
    def mkStore(p: String) = new FeatureStore(spark, "unused", p,
      dsMap = Seq("n_val" -> "ld"),
      loaders = Map("ld" -> FeatureHandler(
        compute = (_, _, _) => {
          // first invocation parks INSIDE the A-side critical section
          // (lock held, generation captured) until B has committed
          if (computes.incrementAndGet() == 1) {
            entered.countDown()
            assert(release.await(60, TimeUnit.SECONDS))
          }
          rows(1L, 10L, "2020-01-05", "2020-01-10")
        },
        keyJoin = Aggregators.Sum, feature = "n_val")))
    val storeA = mkStore(pathA)
    val storeB = mkStore(pathB)
    spark.conf.set("graft.lock_stale_ms", "250")
    spark.conf.set("graft.lock_wait_increment_ms", "20")
    try {
      val aErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val a = new Thread(() => {
        try storeA.getFeature("n_val", "2020-01-01", "2020-01-31")
        catch { case t: Throwable => aErr.set(t) }
      })
      a.start()
      assert(entered.await(60, TimeUnit.SECONDS))
      Thread.sleep(400) // age A's lock past lock_stale_ms
      // B (the "second machine") breaks A's now-stale lock and commits
      // a row OUTSIDE A's compute range
      storeB.appendCommit("ld",
        rows(9L, 77L, "2021-06-01", "2021-06-02"),
        "1970-01-01 00:00:00")
      assert(storeB.tableGen("ld") == 1L)
      release.countDown()
      a.join(120000)
      assert(aErr.get() == null, s"driver A failed: ${aErr.get()}")
      // A's first publish was CAS-refused (gen 0 -> taken), so compute
      // re-ran against the fresh table
      assert(computes.get() == 2,
        s"expected a stale retry (2 computes), saw ${computes.get()}")
      assert(storeA.tableGen("ld") == 2L)
      // BOTH commits landed: B's appended row survived A's merge and
      // A's computed row is present
      val open = spark.read.parquet(s"$pathA/ld")
        .filter(col(graft.core.Scd2.UntilTs).isNull)
        .select(col("key_x"), col("n_val"))
        .as[(Long, Long)].collect().toSet
      assert(open == Set((1L, 10L), (9L, 77L)), s"open rows: $open")
    } finally {
      spark.conf.unset("graft.lock_stale_ms")
      spark.conf.unset("graft.lock_wait_increment_ms")
    }
  }
}
