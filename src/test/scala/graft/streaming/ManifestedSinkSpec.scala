package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Layout

/** The streaming half of the layout-maintenance story: a sink that lands
  * micro-batches AND keeps the scanPruned manifest true in lockstep.
  * Pins the delivery contract (batch-keyed exactly-once across replays
  * and mid-append crashes), the manifest invariant (always equal to a
  * fresh buildManifest of the directory after a refresh), and the
  * self-healing property (a manifest left stale by a crash between data
  * commit and manifest publish is repaired by the next refresh, because
  * updateManifest reconciles against the LISTING, not the batch).
  */
class ManifestedSinkSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def ev(id: Long, sec: Long, user: Long): Ev =
    Ev(id, new Timestamp(sec * 1000L), user, "click", 1.0)

  private def canon(df: DataFrame): Set[(String, Long, Long, Long, Long, Long)] =
    df.collect().map { r =>
      val f = r.getString(0)
      (f.substring(f.lastIndexOf('/') + 1), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }.toSet

  private val keys = Seq("event_id", "user_id")

  test("streamed batches land exactly once and the live manifest serves pruned scans") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val data = tmp("msink-data"); val man = tmp("msink-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    val in = MemoryStream[Ev]
    val q = sink.start(in.toDF(), tmp("msink-ckpt"))
    try {
      in.addData((1L to 40L).map(i => ev(i, 100 + i, i % 7)): _*)
      q.processAllAvailable()
      in.addData((41L to 90L).map(i => ev(i, 100 + i, i % 7)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val live = spark.read.parquet(data)
    assert(live.count() === 90)
    // manifest invariant: published == fresh rebuild of the directory
    assert(canon(sink.manifest(spark)) ===
      canon(Layout.buildManifest(spark, data, keys)))
    // the reader the sink exists for: pruned == plain filtered, and the
    // probe box actually skips files (two batches => >= 2 files, only
    // those holding event_id <= 40 open)
    val got = sink.scan(spark, Seq(("event_id", 1L, 40L)))
    assert(got.count() === 40)
    assert(got.inputFiles.length < live.inputFiles.length,
      "probe kept every file — pruning receipt is vacuous")
  }

  test("a replayed batch is skipped whole; a mid-append crash is purged and rewritten") {
    val s = spark
    import s.implicits._
    val data = tmp("msink-replay"); val man = tmp("msink-replay-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    val b0 = (1L to 20L).map(i => ev(i, 100 + i, i)).toDF()
    sink.process(b0, 0L)
    val after = spark.read.parquet(data).count()
    // exact replay (restart redelivery): marker present -> no new files,
    // no doubled rows
    sink.process(b0, 0L)
    assert(spark.read.parquet(data).count() === after)
    assert(new java.io.File(data).listFiles()
      .count(_.getName.startsWith("part-b")) ===
      new java.io.File(data).listFiles().count(_.getName.endsWith(".parquet")))

    // mid-append crash: batch 1 left TWO orphan part files but no
    // marker — the replay must purge them and write batch 1 exactly once
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b1 = (21L to 30L).map(i => ev(i, 100 + i, i)).toDF()
    b1.limit(5).write.mode("overwrite").parquet(s"$data/_crashed")
    new java.io.File(s"$data/_crashed").listFiles()
      .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
        assert(fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
          new org.apache.hadoop.fs.Path(data, f"part-b${1L}%09d-9999$i.parquet")))
      }
    fs.delete(new org.apache.hadoop.fs.Path(s"$data/_crashed"), true)
    sink.process(b1, 1L)
    val ids = spark.read.parquet(data).select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 30L), "orphans survived or batch lost rows")
    assert(canon(sink.manifest(spark)) ===
      canon(Layout.buildManifest(spark, data, keys)))
  }

  test("a 0-row part file (empty micro-batch) never bricks the pruned scan") {
    val s = spark
    import s.implicits._
    val data = tmp("msink-empty"); val man = tmp("msink-empty-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    sink.process((1L to 20L).map(i => ev(i, 100 + i, i)).toDF(), 0L)
    // an idle trigger delivers an EMPTY batch; if its write lands a
    // schema-only part file, no group-by over the data can ever produce
    // a manifest row for it — pre-sentinel, the staleness guard tripped
    // FOREVER (listing named a file no rebuild could cover)
    sink.process(spark.emptyDataset[Ev].toDF(), 1L)
    val dataFiles = new java.io.File(data).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).toSet
    val manifestRows = sink.manifest(spark).collect()
    assert(manifestRows.map { r =>
      val f = r.getString(0); f.substring(f.lastIndexOf('/') + 1)
    }.toSet === dataFiles,
      "manifest must cover EVERY listed data file, 0-row files included")
    // 0-row files carry the rows=0 sentinel with null bounds: never
    // opened, never stale
    manifestRows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3), "sentinel bounds must be null")
    }
    assert(sink.scan(spark, Seq(("event_id", 1L, 100L))).count() === 20)
  }

  test("offline compaction composes with the live sink: refresh reconciles the rewrite") {
    val s = spark
    import s.implicits._
    val data = tmp("msink-compact"); val man = tmp("msink-compact-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    (0 until 4).foreach(b => sink.process(
      (b * 10L + 1 to b * 10L + 10).map(i => ev(i, 100 + i, i)).toDF(), b.toLong))
    val before = new java.io.File(data).listFiles().count(_.getName.startsWith("part-"))
    // the small-file debris a streaming sink leaves is exactly what
    // compactSmallFiles exists for; the sink's markers are metadata
    // ("_"-prefixed), not a _spark_metadata exactly-once log, so the
    // compactor must accept the directory
    val r = Layout.compactSmallFiles(spark, data, targetBytes = 1L << 30)
    assert(r.filesAfter < before)
    // the rewrite invalidated every manifest row; one refresh heals it
    assertThrows[IllegalStateException](
      sink.scan(spark, Seq(("event_id", 1L, 100L))).count())
    sink.refreshManifest(spark)
    assert(sink.scan(spark, Seq(("event_id", 1L, 100L))).count() === 40)
    assert(canon(sink.manifest(spark)) ===
      canon(Layout.buildManifest(spark, data, keys)))
  }

  test("readers never fail while 50 manifest refreshes race them (versioned publish)") {
    // Verdict r12 task 1: the old publish overwrote manifestDir in place,
    // so a reader in the delete-to-write window hit a read failure every
    // batch. The versioned publish (immutable vN dirs behind an
    // atomically-renamed _latest pointer) must make scan() safe at any
    // moment — zero failures, always the right rows.
    val s = spark
    import s.implicits._
    val data = tmp("msink-race"); val man = tmp("msink-race-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    sink.process((1L to 30L).map(i => ev(i, 100 + i, i)).toDF(), 0L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val n = sink.scan(spark, Seq(("event_id", 1L, 30L))).count()
          if (n != 30L) failures.compareAndSet(null,
            new AssertionError(s"reader saw $n rows"))
          reads.incrementAndGet()
        } catch { case t: Throwable => failures.compareAndSet(null, t) }
      }
    })
    reader.start()
    try (1 to 50).foreach(_ => sink.refreshManifest(spark))
    finally { stop.set(true); reader.join(30000) }
    assert(failures.get() === null,
      s"reader failed mid-refresh: ${Option(failures.get()).map(_.toString)}")
    assert(reads.get() > 0, "reader thread never completed a scan — vacuous")
    info(s"${reads.get()} concurrent scans across 50 refreshes, zero failures")
    // GC bounded: the pointer pair plus a short reader-safety tail, not
    // 50 accumulated versions
    val versions = new java.io.File(man).listFiles()
      .filter(_.getName.matches("v\\d+")).map(_.getName).sorted.toSeq
    assert(versions.size <= 4, s"version GC leaked: $versions")
    // and genuine drift STILL fails loudly (the guard survived the rework)
    (31L to 35L).map(i => ev(i, 100 + i, i)).toDF()
      .coalesce(1).write.mode("append").parquet(data)
    assertThrows[IllegalStateException](
      sink.scan(spark, Seq(("event_id", 1L, 40L))).count())
  }

  test("refreshManifest never manifests a marker-less partial (crashed attempt)") {
    // ADVICE r13-medium: a refresh racing an uncommitted batch gave its
    // partial part-bN files manifest rows; the replay then purged and
    // rewrote the SAME names with different contents, and updateManifest
    // carried the stale rows (name-keyed) forever — silently wrong boxes
    // the staleness guard cannot see. The refresh must purge marker-less
    // partials first.
    val s = spark
    import s.implicits._
    val data = tmp("msink-partial"); val man = tmp("msink-partial-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    sink.process((1L to 20L).map(i => ev(i, 100 + i, i)).toDF(), 0L)
    // crash state: batch 1 landed TWO partial files, no commit marker —
    // and crucially DIFFERENT content than the eventual replay will write
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (900L to 905L).map(i => ev(i, 100 + i, i)).toDF()
      .coalesce(1).write.mode("overwrite").parquet(s"$data/_crashed")
    new java.io.File(s"$data/_crashed").listFiles()
      .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
        assert(fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
          new org.apache.hadoop.fs.Path(data, f"part-b${1L}%09d-0000$i.parquet")))
      }
    fs.delete(new org.apache.hadoop.fs.Path(s"$data/_crashed"), true)
    // an external refresh (the advice's "safe to call at any time" path)
    sink.refreshManifest(spark)
    // the partials are GONE — not manifested, not left to poison a later
    // name-keyed carry
    val manifested = sink.manifest(spark).collect().map { r =>
      val f = r.getString(0); f.substring(f.lastIndexOf('/') + 1) }.toSet
    assert(!manifested.exists(_.startsWith("part-b000000001-")),
      s"marker-less partial earned a manifest row: $manifested")
    assert(!new java.io.File(data).listFiles()
      .exists(_.getName.startsWith("part-b000000001-")), "partials survived purge")
    // the replay writes batch 1 whole, with its real content
    sink.process((21L to 30L).map(i => ev(i, 100 + i, i)).toDF(), 1L)
    val ids = spark.read.parquet(data).select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 30L), "replay after purge lost or doubled rows")
    assert(canon(sink.manifest(spark)) ===
      canon(Layout.buildManifest(spark, data, keys)))
    // and the manifest boxes are TRUE: a probe for the phantom content
    // returns nothing instead of stale-box confusion
    assert(sink.scan(spark, Seq(("event_id", 900L, 905L))).count() === 0)
  }

  test("a crash mid-publish (orphan version, schema-less dir) cannot brick the sink") {
    // ADVICE r13-low: the old in-place publish could die leaving
    // manifestDir existing but schema-less, so the next refresh's read
    // threw and the stream could not restart. With versioning, an orphan
    // partial version is invisible (pointer never flipped) and later GC'd.
    val s = spark
    import s.implicits._
    val data = tmp("msink-orphan"); val man = tmp("msink-orphan-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    sink.process((1L to 10L).map(i => ev(i, 100 + i, i)).toDF(), 0L)
    val v0 = sink.currentVersion().get
    // simulate a publish that died mid-write: a higher version exists but
    // holds only junk, and the pointer still names v0
    val orphan = new java.io.File(man, s"v${v0 + 5}"); orphan.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(orphan.getPath, "_temporary"), "junk")
    assert(sink.scan(spark, Seq(("event_id", 1L, 10L))).count() === 10,
      "orphan version must be invisible to readers")
    // next refresh publishes PAST the orphan; the retention tail then
    // ages it out
    sink.refreshManifest(spark)
    assert(sink.currentVersion().get > v0 + 5, "publish must never reuse a version")
    assert(sink.scan(spark, Seq(("event_id", 1L, 10L))).count() === 10)
    (1 to 3).foreach(_ => sink.refreshManifest(spark))
    assert(!orphan.exists(), "orphan version survived GC")
  }

  test("sink.recluster restores skipping on batch-ordered debris; replay protection survives") {
    val s = spark
    import s.implicits._
    val data = tmp("msink-recluster"); val man = tmp("msink-recluster-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    // 8 batches, each spanning the full event_id range — the arrival-
    // ordered worst case whose compaction degrades boxes
    (0 until 8).foreach { b =>
      // coalesce(1): ONE file per batch, spanning the full id range —
      // the arrival-ordered shape whose boxes are useless
      sink.process((0L until 10L).map(i => ev(b + 1 + i * 8, 100 + i, i))
        .toDF().coalesce(1), b.toLong)
    }
    val bounds = Seq(("event_id", 1L, 16L))
    val totalBefore = new java.io.File(data).listFiles()
      .count(_.getName.startsWith("part-"))
    val keptBefore = sink.scan(spark, bounds).inputFiles.length
    assert(keptBefore >= totalBefore - 1,
      s"fixture unexpectedly clustered: $keptBefore/$totalBefore")
    val receipt = sink.recluster(spark, numFiles = 8, buckets = 64)
    assert(receipt.rows === 80L)
    // manifest was published in the same call: scan works immediately
    val got = sink.scan(spark, bounds)
    assert(got.count() === 16)
    val keptAfter = got.inputFiles.length
    info(s"files kept for $bounds: $keptBefore/$totalBefore -> " +
      s"$keptAfter/${receipt.filesAfter}")
    assert(keptAfter.toDouble / receipt.filesAfter * 2 <=
      keptBefore.toDouble / totalBefore,
      "recluster did not restore the sink table's skipping")
    // commit markers carried: a restart's replay of an old batch must
    // still be skipped whole (no duplicates through the rewrite)
    sink.process((0L until 10L).map(i => ev(3 + i * 8, 103, i)).toDF(), 2L)
    assert(spark.read.parquet(data).count() === 80, "replay after recluster duplicated rows")
  }

  test("autoReclusterAt keeps the live table's file count bounded across many batches") {
    val s = spark
    import s.implicits._
    val data = tmp("msink-auto"); val man = tmp("msink-auto-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys,
      autoReclusterAt = Some(8), reclusterFiles = 4, reclusterBuckets = 64)
    def files(): Int = new java.io.File(data).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    (0 until 20).foreach { b =>
      sink.process((0L until 5L).map(i => ev(b * 5 + i + 1, 100 + i, i)).toDF()
        .coalesce(1), b.toLong)
      assert(files() <= 8 + 1, s"file count unbounded at batch $b: ${files()}")
    }
    // data exact through every rewrite, scans + manifest still true
    assert(spark.read.parquet(data).count() === 100)
    assert(sink.scan(spark, Seq(("event_id", 1L, 1000L))).count() === 100)
    assert(canon(sink.manifest(spark)) ===
      canon(Layout.buildManifest(spark, data, keys)))
    // replay protection survives the rewrites: markers are carried
    sink.process((0L until 5L).map(i => ev(16 + i, 103, i)).toDF(), 3L)
    assert(spark.read.parquet(data).count() === 100,
      "replay after auto-recluster duplicated rows")
  }

  test("scanAsOf reads a committed version's exact snapshot; maintenance makes it fail loudly") {
    val s = spark
    import s.implicits._
    val data = tmp("msink-asof"); val man = tmp("msink-asof-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    val bounds = Seq(("event_id", 1L, 1000L))
    sink.process((1L to 20L).map(i => ev(i, 100 + i, i)).toDF().coalesce(1), 0L)
    sink.process((21L to 40L).map(i => ev(i, 100 + i, i)).toDF().coalesce(1), 1L)
    val v1 = sink.currentVersion().get
    sink.process((41L to 70L).map(i => ev(i, 100 + i, i)).toDF().coalesce(1), 2L)

    // live scan sees everything; the as-of read sees exactly the first
    // two batches — later appends are invisible to the pinned version
    assert(sink.scan(spark, bounds).count() === 70)
    val snap = sink.scanAsOf(spark, v1, bounds)
    assert(snap.count() === 40)
    assert(snap.agg(max(col("event_id"))).head().getLong(0) === 40L)
    // version inventory: ascending, committed-only, and v1 retained
    assert(sink.versions().contains(v1))
    assert(sink.versions() === sink.versions().sorted)
    // an uncommitted version number fails loudly
    assertThrows[IllegalArgumentException](
      sink.manifestAt(spark, sink.versions().max + 100))

    // maintenance rewrites the files: the snapshot must fail LOUDLY
    // (explicit-path read of vanished files), never return partial data
    sink.recluster(spark, numFiles = 4, buckets = 64)
    assert(sink.scan(spark, bounds).count() === 70, "recluster lost rows")
    val stale = intercept[Exception](sink.scanAsOf(spark, v1, bounds).count())
    assert(stale.getMessage != null)
  }

  test("manifestRetention bounds the GC window: min(N, retention) versions, older asOf fails") {
    val s = spark
    import s.implicits._
    // retention 0 would GC the version just published — hard error
    assertThrows[IllegalArgumentException](
      new ManifestedParquetSink(tmp("msink-r0"), tmp("msink-r0m") + "/m",
        keys, manifestRetention = 0))

    val data = tmp("msink-ret"); val man = tmp("msink-ret-man") + "/m"
    val retention = 5
    val sink = new ManifestedParquetSink(data, man, keys,
      manifestRetention = retention)
    sink.process((1L to 10L).map(i => ev(i, 100 + i, i)).toDF().coalesce(1), 0L)

    // fewer refreshes than the window: every version is retained
    (1 to 3).foreach(_ => sink.refreshManifest(spark))
    assert(sink.versions().size === 4) // 1 publish from process + 3 refreshes
    val early = sink.versions().min

    // push past the window: exactly `retention` committed versions remain,
    // the newest ones, and the early version is gone (GC, not history)
    (1 to 6).foreach(_ => sink.refreshManifest(spark))
    val vs = sink.versions()
    assert(vs.size === retention,
      s"retention=$retention must bound the window, got ${vs.size}")
    assert(vs === vs.sorted && vs.max === sink.currentVersion().get)
    assert(!vs.contains(early))
    // the dropped version fails manifestAt/scanAsOf LOUDLY
    assertThrows[IllegalArgumentException](
      sink.scanAsOf(spark, early, Seq(("event_id", 1L, 100L))).count())
    // every retained version still serves its snapshot (same data here —
    // refreshes without appends publish identical manifests)
    vs.foreach { v =>
      assert(sink.scanAsOf(spark, v, Seq(("event_id", 1L, 100L))).count() === 10)
    }

    // retention 1 = current-only: after any refresh exactly one version
    val d1 = tmp("msink-ret1"); val m1 = tmp("msink-ret1-man") + "/m"
    val one = new ManifestedParquetSink(d1, m1, keys, manifestRetention = 1)
    one.process((1L to 5L).map(i => ev(i, 100 + i, i)).toDF().coalesce(1), 0L)
    (1 to 3).foreach(_ => one.refreshManifest(spark))
    assert(one.versions().size === 1)
    assert(one.scan(spark, Seq(("event_id", 1L, 100L))).count() === 5)
  }

  test("a manifest left stale by a crash self-heals on the next refresh") {
    val s = spark
    import s.implicits._
    val data = tmp("msink-heal"); val man = tmp("msink-heal-man") + "/m"
    val sink = new ManifestedParquetSink(data, man, keys)
    sink.process((1L to 20L).map(i => ev(i, 100 + i, i)).toDF(), 0L)
    // crash window: data for batch 1 committed, manifest publish never ran
    // (simulated by appending files directly, bypassing the sink)
    (21L to 25L).map(i => ev(i, 100 + i, i)).toDF()
      .coalesce(1).write.mode("append").parquet(data)
    // the reader fails LOUDLY, not silently-wrong
    assertThrows[IllegalStateException](
      sink.scan(spark, Seq(("event_id", 1L, 100L))).count())
    // next refresh (what any subsequent batch runs) repairs it
    sink.refreshManifest(spark)
    assert(sink.scan(spark, Seq(("event_id", 1L, 100L))).count() === 25)
    assert(canon(sink.manifest(spark)) ===
      canon(Layout.buildManifest(spark, data, keys)))
  }
}
