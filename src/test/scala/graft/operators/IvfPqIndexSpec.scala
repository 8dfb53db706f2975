package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted IVF-PQ index's lifecycle contract (round-15 task 1):
  * search equality with the in-query-training sibling, persisted ==
  * retrained artifact equality, fingerprint-gated build-once reuse and
  * rebuild-on-change (versioned generation swap), frozen-model add with
  * scanAsOf time travel to the pre-add snapshot, and cell-pruned probing
  * after recluster maintenance. The DuckDB oracle re-proves the search
  * RESULT cross-engine every round; these pin the artifact and the
  * lifecycle, which the oracle cannot see. */
class IvfPqIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ivfpq_index_$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
    df.select(col("qid"), col("vec_id"), col("approx_d2"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("indexed search equals the in-query-training sibling, row for row") {
    val s = spark
    val root = tmpRoot("eq")
    assert(IvfPqIndex.ensure(s, sfDir, root).contains(1L))
    val indexed = rows(IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3))
    val sibling = rows(EmbeddingOps.ivfPqTrainedResidual(s, sfDir, 2, 3))
    assert(sibling.nonEmpty, "vacuous — sibling returned nothing")
    assert(indexed === sibling,
      s"only-indexed=${(indexed -- sibling).take(3)} only-sibling=${(sibling -- indexed).take(3)}")
    // and at a different operating point (deeper probe) off the SAME
    // persisted artifact — the build-once/query-many point
    val indexed4 = rows(IvfPqIndex.query(s, sfDir, root, nprobe = 4, k = 3))
    val sibling4 = rows(EmbeddingOps.ivfPqTrainedResidual(s, sfDir, 4, 3))
    assert(indexed4 === sibling4)
  }

  test("persisted artifact equals a fresh retrain: centroids, codebook, coded corpus") {
    val s = spark
    val root = tmpRoot("artifact")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val parts = EmbeddingOps.ivfPqTrainParts(s, sfDir)
      .getOrElse(fail("vacuous — corpus lacks model rows"))
    val gDir = s"$root/g1"
    val pCents = s.read.parquet(s"$gDir/centroids")
      .select("cid", "ce", "cn").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq, r.getDouble(2))).toSet
    val tCents = parts.cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq, r.getDouble(2))).toSet
    assert(pCents === tCents, "persisted centroids drifted from training output")
    val pCb = s.read.parquet(s"$gDir/codebook").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toSeq)).toMap
    assert(pCb.size === 128)
    for (j <- 0 until 8; c <- 0 until 16)
      assert(pCb((j, c)) === parts.cb(j)(c), s"codebook row ($j,$c) drifted")
    val pCoded = IvfPqIndex.codedSink(root, 1L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val tCoded = parts.coded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pCoded === tCoded, "persisted coded corpus drifted from training output")
  }

  test("ensure reuses on an unchanged corpus and rebuilds a new generation on change") {
    val s = spark
    import s.implicits._
    val fixture = java.nio.file.Files.createTempDirectory("ivfpq_fixture").toString
    val root = tmpRoot("rebuild")
    // a corpus this spec OWNS (the sf fixtures are read-only): 64 vecs
    // with the operator's model-row convention
    def writeCorpus(scale: Double): Unit =
      (0L until 64L).map { id =>
        (id, (0 until 64).map(i =>
          (math.sin(id * 7.3 + i * 1.9) * scale).toFloat), (id % 16).toInt)
      }.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$fixture/embeddings.parquet")
    writeCorpus(1.0)
    assert(IvfPqIndex.ensure(s, fixture, root).contains(1L))
    // unchanged corpus -> same generation, nothing rebuilt
    assert(IvfPqIndex.ensure(s, fixture, root).contains(1L))
    assert(IvfPqIndex.currentGeneration(root).contains(1L))
    // changed corpus -> fingerprint misses -> new committed generation
    writeCorpus(0.5)
    assert(IvfPqIndex.ensure(s, fixture, root).contains(2L))
    assert(IvfPqIndex.currentGeneration(root).contains(2L))
    // the new generation answers for the new corpus, exactly
    val indexed = rows(IvfPqIndex.query(s, fixture, root, 2, 3))
    val sibling = rows(EmbeddingOps.ivfPqTrainedResidual(s, fixture, 2, 3))
    assert(indexed === sibling && sibling.nonEmpty)
    // retention 2: generation 1 is still on disk for in-flight readers
    assert(new java.io.File(s"$root/g1/_graft_ok").exists())
    // a third rebuild GCs generation 1
    writeCorpus(0.25)
    assert(IvfPqIndex.ensure(s, fixture, root).contains(3L))
    assert(!new java.io.File(s"$root/g1").exists(), "generation 1 survived retention")
  }

  test("addVectors codes with the frozen model; scanAsOf time-travels to the pre-add snapshot") {
    val s = spark
    import s.implicits._
    val root = tmpRoot("add")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val sink = IvfPqIndex.codedSink(root, 1L)
    val v1 = sink.versions().max
    val bounds = Seq(("cell", Long.MinValue, Long.MaxValue))
    val before = sink.scan(s, bounds).count()
    // novel vectors (ids far past the corpus), deterministic content
    val novel = (9000L until 9008L).map { id =>
      (id, (0 until 64).map(i => (math.cos(id * 3.7 + i) * 0.9).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    IvfPqIndex.addVectors(s, root, novel, batchId = 1L)
    val after = sink.scan(s, bounds)
    assert(after.count() === before + 8)
    // frozen-model contract: the added rows' codes equal what a direct
    // encode against the persisted model computes (no retrain happened)
    val added = after.filter(col("vec_id") >= 9000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(added.size === 8)
    assert(added.forall { case (_, cell, _) => cell >= 10L && cell <= 25L })
    // time travel: the retained pre-add manifest version still reads the
    // exact pre-add file set
    val snap = sink.scanAsOf(s, v1, bounds)
    assert(snap.count() === before)
    assert(snap.filter(col("vec_id") >= 9000L).isEmpty)
    // and the live query sees added vectors as candidates
    val hits = IvfPqIndex.query(s, sfDir, root, nprobe = 4, k = 500)
      .filter(col("vec_id") >= 9000L).count()
    assert(hits > 0, "added vectors never surfaced as search candidates")
  }

  test("streaming ingest lands vectors exactly-once across a restart; query sees them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = tmpRoot("ingest")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val sink = IvfPqIndex.codedSink(root, 1L)
    val bounds = Seq(("cell", Long.MinValue, Long.MaxValue))
    val base = sink.scan(s, bounds).count()
    val ckpt = java.nio.file.Files.createTempDirectory("ivfpq_ingest_ck").toString
    def vec(id: Long) =
      (id, (0 until 64).map(i => (math.sin(id * 2.9 + i * 0.7)).toFloat))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    def drain(): Unit = {
      val q = IvfPqIndex.startIngest(
        in.toDF().toDF("vec_id", "embedding"), root, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    in.addData((7000L until 7010L).map(vec))
    drain()
    assert(sink.scan(s, bounds).count() === base + 10)
    // restart on the same checkpoint: nothing replays as a duplicate,
    // and the next micro-batch continues the id sequence
    in.addData((7010L until 7016L).map(vec))
    drain()
    val after = sink.scan(s, bounds)
    assert(after.count() === base + 16)
    assert(after.filter(col("vec_id") >= 7000L)
      .groupBy(col("vec_id")).count().filter(col("count") > 1).isEmpty,
      "a replayed ingest batch landed twice")
    // ingested vectors are real candidates with frozen-model codes
    val hits = IvfPqIndex.query(s, sfDir, root, nprobe = 4, k = 1000)
      .filter(col("vec_id") >= 7000L)
    assert(hits.count() > 0, "ingested vectors never surfaced in search")
    // a SECOND stream with a fresh checkpoint restarts micro-batch ids
    // at 0 — its slot offset must keep those from shadowing (and being
    // silently skipped by) the first stream's committed batch markers
    val ckpt2 = java.nio.file.Files.createTempDirectory("ivfpq_ingest_ck2").toString
    val in2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    in2.addData((8000L until 8005L).map(vec))
    val q2 = IvfPqIndex.startIngest(
      in2.toDF().toDF("vec_id", "embedding"), root, ckpt2)
    try q2.processAllAvailable() finally q2.stop()
    assert(sink.scan(s, bounds).count() === base + 16 + 5,
      "second ingest stream's first batch was shadowed by the first stream's markers")
  }

  test("self-maintaining ingest: autoReclusterAt bounds coded-table debris, data exact, probes still prune") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.execution.rangeExchange.sampleSizePerPartition")
    s.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", "5000")
    try {
      val root = tmpRoot("maint")
      assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
      val ckpt = java.nio.file.Files.createTempDirectory("ivfpq_maint_ck").toString
      def vec(id: Long) =
        (id, (0 until 64).map(i => (math.sin(id * 1.7 + i * 0.9)).toFloat))
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
      val q = IvfPqIndex.startIngest(
        in.toDF().toDF("vec_id", "embedding"), root, ckpt,
        autoReclusterAt = Some(16))
      // 15 micro-batches of 8 vectors: without maintenance that is 15+
      // files of batch debris; the threshold policy must keep resetting
      // the curve
      try (0 until 15).foreach { b =>
        in.addData((6000L + b * 8 until 6008L + b * 8).map(vec))
        q.processAllAvailable()
      } finally q.stop()
      val sink = IvfPqIndex.codedSink(root, 1L)
      val bounds = Seq(("cell", Long.MinValue, Long.MaxValue))
      val all = sink.scan(s, bounds)
      // exact through every inline rewrite (the lifecycle's whole point)
      assert(all.filter(col("vec_id") >= 6000L).count() === 15L * 8)
      assert(all.filter(col("vec_id") >= 6000L)
        .groupBy(col("vec_id")).count().filter(col("count") > 1).isEmpty)
      // debris bounded: file count stays near the recluster target, not
      // at build-files + 15 (loose bound — the flaky-file-count lesson)
      val files = all.select(input_file_name()).distinct().count()
      assert(files <= 40, s"maintenance never engaged: $files files on disk")
      // and the re-clustered layout still prunes single-cell probes
      val oneCell = sink.scan(s, Seq(("cell", 12L, 12L)))
        .select(input_file_name()).distinct().count()
      assert(oneCell < files,
        s"single-cell probe opened all $files files after maintenance")
      // the misconfiguration class the sink now rejects loudly: a
      // recluster target without 2x headroom under the trigger
      // threshold re-fires a full table rewrite every few batches
      intercept[IllegalArgumentException] {
        new graft.streaming.ManifestedParquetSink(
          s"$root/x", s"$root/xm", Seq("cell", "vec_id"),
          autoReclusterAt = Some(12), reclusterFiles = 8)
      }
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", v)
      case None => s.conf.unset("spark.sql.execution.rangeExchange.sampleSizePerPartition")
    }
  }

  test("an ingest stream bound to a superseded generation fails loudly, never appends silently") {
    // the silent-loss scenario: a long-running ingest stream on g1, a
    // rebuild publishes g2 (whose later GC would delete g1) — the
    // stream's next batch must REFUSE, not keep appending into a
    // generation no query reads and no GC spares
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = tmpRoot("genbind")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val ckpt = java.nio.file.Files.createTempDirectory("ivfpq_bind_ck").toString
    def vec(id: Long) =
      (id, (0 until 64).map(i => (math.cos(id + i * 0.3)).toFloat))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = IvfPqIndex.startIngest(in.toDF().toDF("vec_id", "embedding"), root, ckpt)
    try {
      in.addData((4000L until 4004L).map(vec))
      q.processAllAvailable() // bound generation still live: fine
      assert(IvfPqIndex.build(s, sfDir, root).contains(2L)) // supersede
      in.addData((4004L until 4008L).map(vec))
      val err = intercept[Throwable](q.processAllAvailable())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("superseded")),
        s"stream did not fail on the superseded generation: ${messages(err).take(3)}")
    } finally q.stop()
    // and nothing from the refused batch leaked into EITHER generation
    val b2 = Seq(("cell", Long.MinValue, Long.MaxValue))
    assert(IvfPqIndex.codedSink(root, 2L).scan(s, b2)
      .filter(col("vec_id") >= 4004L).isEmpty)
  }

  test("drift monitor: in-distribution ingest stays quiet, shifted vectors fire a create-once alert") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = tmpRoot("drift")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    assert(IvfPqIndex.driftAlert(root).isEmpty)
    val ckpt = java.nio.file.Files.createTempDirectory("ivfpq_drift_ck").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = IvfPqIndex.startIngest(
      in.toDF().toDF("vec_id", "embedding"), root, ckpt,
      driftAlertAt = Some(3.0))
    try {
      // in-distribution batch: actual corpus vectors under new ids —
      // mean residual ≈ the build baseline, far under the 3x threshold
      val inDist = graft.Tables.t(s, sfDir, "embeddings")
        .selectExpr("vec_id + 50000 AS vec_id", "embedding")
        .limit(32).as[(Long, Seq[Float])].collect().toSeq
      in.addData(inDist)
      q.processAllAvailable()
      assert(IvfPqIndex.driftAlert(root).isEmpty,
        "alert fired on in-distribution ingest")
      // shifted batch: +5.0 per dimension — residuals explode past any
      // cell's reach; the monitor must flag the model as stale
      in.addData(inDist.map { case (id, e) =>
        (id + 1000, e.map(_ + 5.0f)) })
      q.processAllAvailable()
      val alert = IvfPqIndex.driftAlert(root)
      assert(alert.isDefined, "drifted batch raised no alert")
      assert(alert.get.contains("ratio="), s"malformed alert: $alert")
      // create-once: another drifted batch does not overwrite the first
      in.addData(inDist.map { case (id, e) => (id + 2000, e.map(_ + 9.0f)) })
      q.processAllAvailable()
      assert(IvfPqIndex.driftAlert(root) === alert)
    } finally q.stop()
    // detection, not usurpation: the alert does NOT make ensure()
    // rebuild behind the operator's back (the source corpus is
    // unchanged; a retrain needs a refreshed reference corpus)
    assert(IvfPqIndex.ensure(s, sfDir, root).contains(1L))
  }

  test("concurrent ensure() calls build exactly one generation (ConcurrentBench's shape)") {
    // ConcurrentBench runs registered queries from N threads; the first
    // wave of e_knn_ivfpq_indexed invocations on a cold root must
    // serialize into ONE build — a second builder racing the first
    // would interleave renames into a corrupt-but-committed artifact
    // (the class the build lock + double-checked ensure close).
    val s = spark
    val root = tmpRoot("concurrent")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val gens = Await.result(
      Future.sequence((1 to 4).map(_ => Future(IvfPqIndex.ensure(s, sfDir, root)))),
      5.minutes)
    assert(gens.forall(_.contains(1L)),
      s"concurrent ensure() diverged: $gens — a racer built a second generation")
    // exactly one generation on disk, committed, and it answers queries
    assert(IvfPqIndex.currentGeneration(root).contains(1L))
    assert(!new java.io.File(s"$root/g2").exists())
    val out = rows(IvfPqIndex.query(s, sfDir, root, 2, 3))
    assert(out === rows(EmbeddingOps.ivfPqTrainedResidual(s, sfDir, 2, 3)))
  }

  test("recluster by cell restores probe-time file skipping") {
    val s = spark
    import s.implicits._
    // exact range cuts regardless of suite order (the r14 sampler lesson)
    val prev = s.conf.getOption("spark.sql.execution.rangeExchange.sampleSizePerPartition")
    s.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", "5000")
    try {
      val root = tmpRoot("recluster")
      assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
      // simulate ingest debris: several add batches, each spraying all cells
      (1L to 4L).foreach { b =>
        val vecs = (9000L + b * 100 until 9032L + b * 100).map { id =>
          (id, (0 until 64).map(i => (math.sin(id * 1.3 + i * 2.1)).toFloat), 0)
        }.toDF("vec_id", "embedding", "label")
        IvfPqIndex.addVectors(s, root, vecs, batchId = b)
      }
      val sink = IvfPqIndex.codedSink(root, 1L)
      sink.recluster(s, numFiles = 8, buckets = 64)
      val bounds = Seq(("cell", Long.MinValue, Long.MaxValue))
      def filesOf(df: org.apache.spark.sql.DataFrame): Long =
        df.select(input_file_name()).distinct().count()
      val allFiles = filesOf(sink.scan(s, bounds))
      val oneCell = sink.scan(s, Seq(("cell", 12L, 12L)))
      val oneCellFiles = filesOf(oneCell)
      assert(allFiles >= 6, s"recluster produced only $allFiles files — probe can't show skipping")
      assert(oneCellFiles < allFiles,
        s"single-cell probe opened all $allFiles files — manifest pruning dead")
      // pruning is sound: the pruned scan returns exactly the cell's rows
      val direct = sink.scan(s, bounds).filter(col("cell") === 12L)
      assert(oneCell.count() === direct.count() && oneCell.count() > 0)
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", v)
      case None => s.conf.unset("spark.sql.execution.rangeExchange.sampleSizePerPartition")
    }
  }
}
