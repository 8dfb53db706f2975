package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.FsIo

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

  test("attr-only drift rebuilds: vectors unchanged, re-attributed corpus must not reuse (ADVICE r18)") {
    val s = spark
    import s.implicits._
    val fixture = java.nio.file.Files.createTempDirectory("ivfpq_attr").toString
    val root = tmpRoot("attrdrift")
    // a corpus with an EXPLICIT attr column (withAttr prefers it over
    // label) — only attr varies between the two writes; vec_id,
    // embedding and label are bit-identical
    def writeCorpus(attrOf: Long => Int): Unit =
      (0L until 64L).map { id =>
        (id, (0 until 64).map(i =>
          (math.sin(id * 7.3 + i * 1.9)).toFloat), (id % 16).toInt, attrOf(id))
      }.toDF("vec_id", "embedding", "label", "attr")
        .coalesce(1).write.mode("overwrite").parquet(s"$fixture/embeddings.parquet")
    writeCorpus(id => (id % 2).toInt)
    assert(IvfPqIndex.ensure(s, fixture, root).contains(1L))
    val before = IvfPqIndex.queryFiltered(s, fixture, root, nprobe = 4, k = 3, attrEq = 1)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.nonEmpty, "vacuous — filtered search returned nothing")
    // re-attribute EVERY row (complement), vectors untouched: the
    // fingerprint must miss and ensure must build generation 2 — the
    // pre-fix fingerprint hashed label but served attr, so this exact
    // shape reused g1 and answered stale
    writeCorpus(id => 1 - (id % 2).toInt)
    assert(IvfPqIndex.ensure(s, fixture, root).contains(2L),
      "attr-only drift must rebuild, not reuse the stale generation")
    val after = IvfPqIndex.queryFiltered(s, fixture, root, nprobe = 4, k = 3, attrEq = 1)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the attr sets are complementary, so the served candidate sets
    // must be disjoint on vec_id parity — stale answers would overlap
    assert(after.nonEmpty)
    assert(before.forall { case (_, v) => v % 2 == 1 })
    assert(after.forall { case (_, v) => v % 2 == 0 },
      s"filtered search served stale attrs after re-attribution: $after")
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

  test("handoff: drift alert -> rebuild -> stream restart loses no vector across the generation swap") {
    // The round-16 flagship choreography, end to end: a live monitored
    // ingest stream, a drift alert, an operator-designated refreshed
    // corpus that contains SOME of the ingested vectors (graduated) but
    // not the drifted tail, a handoff mid-stream, the bound stream
    // failing loudly, and a restart ON THE SAME CHECKPOINT — the final
    // vector set must equal an uninterrupted run's, bit for bit.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val fixture1 = java.nio.file.Files.createTempDirectory("ivfpq_ho_c1").toString
    val fixture2 = java.nio.file.Files.createTempDirectory("ivfpq_ho_c2").toString
    val root = tmpRoot("handoff")
    def baseVec(id: Long): Seq[Float] =
      (0 until 64).map(i => (math.sin(id * 7.3 + i * 1.9)).toFloat)
    def writeCorpus(dir: String, extra: Seq[(Long, Seq[Float])]): Unit =
      ((0L until 64L).map(id => (id, baseVec(id), (id % 16).toInt)) ++
        extra.map { case (id, e) => (id, e, 0) })
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    writeCorpus(fixture1, Nil)
    assert(IvfPqIndex.ensure(s, fixture1, root).contains(1L))
    // in-distribution ingest: exact corpus vectors under new ids (the
    // graduating cohort), then a +5/dim shifted tail that fires the alert
    val inDist = (0L until 16L).map(j => (100L + j, baseVec(j)))
    val shifted = (200L until 205L).map(id =>
      (id, baseVec(id).map(_ + 5.0f)))
    val ckpt = java.nio.file.Files.createTempDirectory("ivfpq_ho_ck").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = IvfPqIndex.startIngest(
      in.toDF().toDF("vec_id", "embedding"), root, ckpt,
      driftAlertAt = Some(2.0))
    in.addData(inDist)
    q.processAllAvailable()
    assert(IvfPqIndex.driftAlert(root).isEmpty, "alert fired on in-distribution ingest")
    in.addData(shifted)
    q.processAllAvailable()
    assert(IvfPqIndex.driftAlert(root).isDefined, "shifted tail raised no alert")
    // an index-level delete before the swap: the tombstoned id must not
    // ride the handoff back in
    assert(IvfPqIndex.deleteVectors(s, root, Seq(202L), batchId = 7L) === 1L)
    // operator designates the refreshed corpus: graduates the in-dist
    // cohort, does NOT contain the drifted tail
    writeCorpus(fixture2, inDist)
    assert(IvfPqIndex.handoff(s, fixture2, root).contains(2L))
    assert(IvfPqIndex.driftAlert(root).isEmpty, "new generation inherited the old alert")
    // the still-running stream is bound to g1: its next batch fails
    // loudly and is NEVER checkpoint-committed...
    in.addData((300L until 305L).map(id => (id, baseVec(id + 17))))
    val err = intercept[Throwable](q.processAllAvailable())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("superseded")), s"${messages(err).take(3)}")
    q.stop()
    // ...so a restart ON THE SAME CHECKPOINT replays it into g2
    val q2 = IvfPqIndex.startIngest(
      in.toDF().toDF("vec_id", "embedding"), root, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val g2 = IvfPqIndex.codedSink(root, 2L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = g2.map(_._1)
    assert(ids.toSet === ((0L until 64L) ++ (100L until 116L) ++
      Seq(200L, 201L, 203L, 204L) ++ (300L until 305L)).toSet,
      "handoff + replay did not reconstruct the exact vector set")
    assert(ids.length === ids.toSet.size, "a vector landed twice across the swap")
    // bit-equality with an UNINTERRUPTED run: build g1 directly from the
    // refreshed corpus and add the same post-snapshot vectors — every
    // coded row beyond the corpus must match (frozen-model determinism)
    val ref = tmpRoot("handoff_ref")
    assert(IvfPqIndex.build(s, fixture2, ref).contains(1L))
    IvfPqIndex.addVectors(s, ref,
      (shifted.filterNot(_._1 == 202L) ++
        (300L until 305L).map(id => (id, baseVec(id + 17))))
        .toDF("vec_id", "embedding"), batchId = 1L)
    val refRows = IvfPqIndex.codedSink(ref, 1L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .filter(col("vec_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(g2.filter(_._1 >= 100L).toSet === refRows,
      "handoff-carried codes diverged from an uninterrupted run's")
  }

  test("deleteVectors tombstones: query excludes, scanAsOf still sees, purge drops the bytes") {
    val s = spark
    val root = tmpRoot("delete")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val sink = IvfPqIndex.codedSink(root, 1L)
    val bounds = Seq(("cell", Long.MinValue, Long.MaxValue))
    val preVersion = sink.versions().max
    val preCount = sink.scan(s, bounds).count()
    // pick a vector that actually SURFACES in search results — deleting
    // it must visibly change the answer, not just the storage
    val victim = IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3)
      .filter(col("rnk") === 1).select(col("vec_id")).head().getLong(0)
    assert(IvfPqIndex.deleteVectors(s, root, Seq(victim), batchId = 3L) === 1L)
    // deleted vector never returned — at ANY probe depth
    assert(IvfPqIndex.query(s, sfDir, root, 2, 3)
      .filter(col("vec_id") === victim).isEmpty)
    assert(IvfPqIndex.query(s, sfDir, root, 4, 1000)
      .filter(col("vec_id") === victim).isEmpty)
    // every query still fills its top-3 (the next candidate promotes)
    val perQ = IvfPqIndex.query(s, sfDir, root, 2, 3)
      .groupBy(col("qid")).count().select(col("count")).collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(0) === 3L))
    // the data row is untouched: the live scan AND the pre-delete
    // snapshot both still hold it (a tombstone is metadata, not a rewrite)
    assert(sink.scan(s, bounds).filter(col("vec_id") === victim).count() === 1L)
    assert(sink.scanAsOf(s, preVersion, bounds)
      .filter(col("vec_id") === victim).count() === 1L)
    // idempotent replay: the same delete batch id skips, no double tombstone
    assert(IvfPqIndex.deleteVectors(s, root, Seq(victim), batchId = 3L) === 1L)
    // deleting an id with no live row is a loud-free no-op
    assert(IvfPqIndex.deleteVectors(s, root, Seq(999999L), batchId = 4L) === 0L)
    // PURGE: recluster drops the deleted row and its tombstones physically
    val r = IvfPqIndex.purgeDeleted(s, root)
    assert(r.rows === preCount - 1)
    assert(sink.scan(s, bounds).count() === preCount - 1)
    assert(sink.scan(s, bounds).filter(col("vec_id") === victim).isEmpty)
    assert(!new java.io.File(s"$root/g1/tombs").exists(), "tombstones survived the purge")
    assert(IvfPqIndex.query(s, sfDir, root, 2, 3)
      .filter(col("vec_id") === victim).isEmpty)
    // nothing left to purge -> loud
    intercept[IllegalStateException](IvfPqIndex.purgeDeleted(s, root))
  }

  test("ensure(pristineOnly) rebuilds a mutated generation; the registered query stays f(corpus)") {
    val s = spark
    import s.implicits._
    val root = tmpRoot("pristine")
    assert(IvfPqIndex.ensure(s, sfDir, root, pristineOnly = true).contains(1L))
    // reuse while pristine
    assert(IvfPqIndex.ensure(s, sfDir, root, pristineOnly = true).contains(1L))
    // out-of-band ADD mutates the artifact: the coded table is no longer
    // f(corpus), so the oracle-checked path must rebuild...
    IvfPqIndex.addVectors(s, root,
      Seq((9100L, (0 until 64).map(i => (math.sin(i * 0.31)).toFloat)))
        .toDF("vec_id", "embedding"), batchId = 1L)
    assert(IvfPqIndex.isMutated(root, 1L))
    assert(IvfPqIndex.ensure(s, sfDir, root, pristineOnly = true).contains(2L))
    // ...and the rebuilt generation answers exactly like the sibling
    assert(rows(IvfPqIndex.query(s, sfDir, root, 2, 3)) ===
      rows(EmbeddingOps.ivfPqTrainedResidual(s, sfDir, 2, 3)))
    // the default (production) gate keeps reusing a mutated generation —
    // adds surviving is the POINT of that path
    IvfPqIndex.deleteVectors(s, root, Seq(0L), batchId = 2L)
    assert(IvfPqIndex.ensure(s, sfDir, root).contains(2L))
    // a DELETE is a mutation too (the oracle would still see the row)
    assert(IvfPqIndex.ensure(s, sfDir, root, pristineOnly = true).contains(3L))
  }

  test("union-of-runs pruning reads fewer files than the probed-cell span on a fragmented index") {
    val s = spark
    import s.implicits._
    val root = tmpRoot("union")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    // fragment: add batches each confined to ONE cell's neighborhood by
    // construction is hard (assignment decides) — instead add several
    // batches and rely on per-batch files having narrow vec_id boxes but
    // broad cell boxes; then compare pruning plans from the MANIFEST
    // directly, where the span-vs-union difference is mechanical
    (1L to 6L).foreach { b =>
      val vecs = (20000L + b * 100 until 20016L + b * 100).map { id =>
        (id, (0 until 64).map(i => (math.sin(id * 1.3 + i * 2.1)).toFloat), 0)
      }.toDF("vec_id", "embedding", "label")
      IvfPqIndex.addVectors(s, root, vecs, batchId = b)
    }
    val sink = IvfPqIndex.codedSink(root, 1L)
    sink.recluster(s, numFiles = 12, buckets = 64)
    val m = sink.manifest(s)
      .select(col("file"), col("cell_min"), col("cell_max")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // two far-apart probed cells, as a low-nprobe probe produces
    val (a, b) = (11L, 24L)
    val spanKept = m.count { case (_, lo, hi) => lo <= b && hi >= a }
    val unionKept = m.count { case (_, lo, hi) =>
      (lo <= a && hi >= a) || (lo <= b && hi >= b) }
    assert(unionKept <= spanKept)
    assert(unionKept < m.length, "union pruning kept every file — vacuous")
    // soundness: the disjunctive scan returns exactly the two cells' rows
    val sets = Seq(Seq(("cell", a, a)), Seq(("cell", b, b)))
    val viaAny = sink.scanAny(s, sets)
    val direct = sink.scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .filter(col("cell") === a || col("cell") === b)
    assert(viaAny.count() === direct.count() && viaAny.count() > 0)
    assert(viaAny.filter(col("cell") =!= a && col("cell") =!= b).isEmpty)
    // and the merged-runs helper: consecutive cells coalesce, gaps split
    assert(IvfPqIndex.cellRuns(Seq(5L, 3L, 4L, 9L, 10L, 20L)) ===
      Seq((3L, 5L), (9L, 10L), (20L, 20L)))
    assert(IvfPqIndex.cellRuns(Seq(7L, 7L, 8L)) === Seq((7L, 8L)))
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

  // ------------------------------------------------------------------
  // OPQ flavor (round 16): the rotation is part of the PERSISTED model.

  /** Re-derive the (vec_id, cell, codes) rows generation `g`'s frozen
    * model would assign to `vecs` — rotation read off disk, then the
    * exact ingest arithmetic (opqApplyRotation → ivfAssign → pqCodes).
    * The spec-side recompute that pins "frozen model" against drift. */
  private def opqExpectedCodes(s: org.apache.spark.sql.SparkSession,
      root: String, g: Long,
      vecs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] = {
    val rot = s.read.parquet(s"$root/g$g/rotation").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rot.length === 64, "rotation table must hold 64 (i, m, u) rows")
    val cents = s.read.parquet(s"$root/g$g/centroids")
    val cbRows = s.read.parquet(s"$root/g$g/codebook").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toSeq)).toMap
    val cb = Seq.tabulate(8)(j => Seq.tabulate(16)(c => cbRows((j, c))))
    val prep = vecs.withColumn("ed", expr("transform(embedding, x -> cast(x as double))"))
    val rotated = EmbeddingOps.opqApplyRotation(
      prep, rot.map(_._2).toSeq, rot.map(_._3).toSeq)
    EmbeddingOps.ivfAssign(rotated, cents, maxRank = 1)
      .select(col("vec_id"), col("cell"),
        graft.functions.GraftFunctions.pqCodes(col("rv"), cb).as("codes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("stats reports the lifecycle numbers from manifests alone, through add/delete/purge") {
    val s = spark
    import s.implicits._
    val root = tmpRoot("stats")
    assert(IvfPqIndex.stats(s, root).isEmpty, "stats invented a generation")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val base = IvfPqIndex.stats(s, root).get
    assert(base.generation === 1L && !base.opq && !base.mutated && !base.purged)
    assert(base.ledgerRows === 0L && base.tombstoneRows === 0L)
    assert(base.driftAlert.isEmpty)
    assert(base.codedRows > 0L && base.codedFiles > 0L)
    // adds show up as coded rows + WAL depth + the mutation witness
    val novel = (9300L until 9306L).map { id =>
      (id, (0 until 64).map(i => (math.cos(id * 3.7 + i) * 0.9).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    IvfPqIndex.addVectors(s, root, novel, batchId = 1L)
    val added = IvfPqIndex.stats(s, root).get
    assert(added.codedRows === base.codedRows + 6 && added.ledgerRows === 6L)
    assert(added.mutated && !added.purged)
    // deletes are purge backlog; purge drains it and flags the rewrite
    assert(IvfPqIndex.deleteVectors(s, root, Seq(9300L, 9301L), batchId = 2L) === 2L)
    assert(IvfPqIndex.stats(s, root).get.tombstoneRows === 2L)
    IvfPqIndex.purgeDeleted(s, root)
    val purged = IvfPqIndex.stats(s, root).get
    assert(purged.tombstoneRows === 0L && purged.purged)
    assert(purged.codedRows === base.codedRows + 4)
    assert(purged.ledgerRows === 4L, "purge must drop purged ids from the WAL too")
  }

  test("stats survives generation files vanishing mid-read (ADVICE r16)") {
    val s = spark
    val root = tmpRoot("stats_race")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    assert(IvfPqIndex.stats(s, root).isDefined)
    // Simulate the swap race a scheduled poller can hit: a concurrent
    // build's generation GC (or purge/handoff) deletes the coded
    // manifest's parquet data AFTER the poller resolved generation 1.
    // The committed version marker still resolves, so the manifest READ
    // throws — stats must catch, retry, and come back None (poll again
    // next tick), never propagate the crash into the scheduler.
    val mroot = new java.io.File(s"$root/g1/coded_manifest")
    val vdirs = Option(mroot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
    assert(vdirs.nonEmpty, "fixture: no committed manifest version found")
    vdirs.foreach(_.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.delete())))
    assert(IvfPqIndex.stats(s, root).isEmpty,
      "stats must degrade to None when the generation vanishes mid-read")
  }

  test("maintenance: a stats reading drives purge, then the loop quiesces (verdict-r16 task 4)") {
    val s = spark
    import s.implicits._
    val root = tmpRoot("maint_purge")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val novel = (9400L until 9406L).map { id =>
      (id, (0 until 64).map(i => (math.cos(id * 3.1 + i) * 0.9).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    IvfPqIndex.addVectors(s, root, novel, batchId = 1L)
    assert(IvfPqIndex.deleteVectors(s, root, Seq(9400L, 9401L), batchId = 2L) === 2L)
    val policy = IvfPqIndex.MaintenancePolicy(
      purgeBacklog = 1L, targetFiles = 4, buckets = 256)
    val actions = graft.streaming.Jobs.indexMaintenance(s, root, policy)
    assert(actions.exists(_.startsWith("purge:2")),
      s"2 tombstones > backlog 1 must drive a purge, got $actions")
    val after = IvfPqIndex.stats(s, root).get
    assert(after.tombstoneRows === 0L && after.purged,
      s"purge did not drain the backlog: $after")
    assert(graft.streaming.Jobs.indexMaintenance(s, root, policy).isEmpty,
      "a healthy index must quiesce (no actions on the next loop)")
  }

  test("maintenance: ingest debris past the file threshold drives compaction, queries unchanged") {
    val s = spark
    import s.implicits._
    val root = tmpRoot("maint_compact")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    val base = IvfPqIndex.stats(s, root).get
    (1L to 3L).foreach { b =>
      val novel = Seq(((9500L + b),
        (0 until 64).map(i => (math.sin((9500 + b) * 2.3 + i) * 0.9).toFloat), 0))
        .toDF("vec_id", "embedding", "label")
      IvfPqIndex.addVectors(s, root, novel, batchId = b)
    }
    val grown = IvfPqIndex.stats(s, root).get
    assert(grown.codedFiles > base.codedFiles, "fixture: adds created no debris")
    val before = rows(IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3))
    val policy = IvfPqIndex.MaintenancePolicy(
      purgeBacklog = 1024L, maxCodedFiles = base.codedFiles,
      targetFiles = base.codedFiles.toInt, buckets = 256)
    val actions = graft.streaming.Jobs.indexMaintenance(s, root, policy)
    assert(actions.exists(_.startsWith("compact:")),
      s"debris ${grown.codedFiles} > ${base.codedFiles} must drive compaction, got $actions")
    val compacted = IvfPqIndex.stats(s, root).get
    assert(compacted.codedFiles <= base.codedFiles,
      s"compaction left ${compacted.codedFiles} files")
    assert(compacted.codedRows === grown.codedRows, "compaction changed content")
    assert(rows(IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3)) === before,
      "compaction changed query results")
  }

  test("maintenance: a drift alert with a designated refreshed corpus drives handoff") {
    val s = spark
    val root = tmpRoot("maint_drift")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    // surface the create-once monitor's alert the way startIngest would
    graft.streaming.FsIo.writeStringAtomic(s"$root/g1/_drift_alert",
      "resid_ratio=2.00 baseline=0.5 current=1.0")
    assert(IvfPqIndex.stats(s, root).get.driftAlert.isDefined)
    // no refreshed corpus designated: the alert is surfaced, not acted on
    assert(IvfPqIndex.maintain(s, root,
      IvfPqIndex.MaintenancePolicy()).isEmpty)
    val policy = IvfPqIndex.MaintenancePolicy(refreshedCorpus = Some(sfDir))
    val actions = graft.streaming.Jobs.indexMaintenance(s, root, policy)
    assert(actions === Seq("handoff:drift:g2"),
      s"drift + refreshed corpus must drive exactly one handoff, got $actions")
    val after = IvfPqIndex.stats(s, root).get
    assert(after.generation === 2L && after.driftAlert.isEmpty,
      s"handoff must land a clean next generation: $after")
  }

  test("opq: persisted rotated index equals the in-query OPQ sibling; rotation stored frozen") {
    val s = spark
    val root = tmpRoot("opq_eq")
    assert(IvfPqIndex.ensure(s, sfDir, root, flavor = IvfPqIndex.Opq).contains(1L))
    // the rotation rides the generation — the plain flavor never writes one
    assert(new java.io.File(s"$root/g1/rotation").exists())
    assert(IvfPqIndex.stats(s, root).exists(_.opq), "stats missed the flavor")
    // build-once: a second ensure of the same flavor reuses generation 1
    assert(IvfPqIndex.ensure(s, sfDir, root, flavor = IvfPqIndex.Opq).contains(1L))
    val indexed = rows(IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3))
    val sibling = rows(EmbeddingOps.opqIvfPqTrainedResidual(s, sfDir, 2, 3))
    assert(sibling.nonEmpty, "vacuous — OPQ sibling returned nothing")
    assert(indexed === sibling,
      s"only-indexed=${(indexed -- sibling).take(3)} only-sibling=${(sibling -- indexed).take(3)}")
    // deeper probe off the SAME persisted artifact
    assert(rows(IvfPqIndex.query(s, sfDir, root, nprobe = 4, k = 3)) ===
      rows(EmbeddingOps.opqIvfPqTrainedResidual(s, sfDir, 4, 3)))
    // and the flavors are genuinely different artifacts: the rotated
    // codes differ from the plain sibling's on this corpus
    val plain = rows(EmbeddingOps.ivfPqTrainedResidual(s, sfDir, 2, 3))
    assert(indexed !== plain, "rotation was a no-op on the fixture — vacuous flavor")
  }

  test("opq: addVectors rotates with the frozen model; the raw ledger keeps pre-rotation embeddings") {
    val s = spark
    import s.implicits._
    val root = tmpRoot("opq_add")
    assert(IvfPqIndex.build(s, sfDir, root, flavor = IvfPqIndex.Opq).contains(1L))
    val novel = (9100L until 9108L).map { id =>
      (id, (0 until 64).map(i => (math.cos(id * 3.7 + i) * 0.9).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    IvfPqIndex.addVectors(s, root, novel, batchId = 1L)
    // frozen-model contract, rotated edition: the landed codes equal a
    // direct recompute under the PERSISTED rotation + centroids + codebook
    val landed = IvfPqIndex.codedSink(root, 1L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .filter(col("vec_id") >= 9100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(landed.size === 8)
    assert(landed === opqExpectedCodes(s, root, 1L, novel))
    // the ledger stores the PRE-rotation embedding (the WAL a handoff
    // re-codes under a RETRAINED rotation), not this generation's frame
    val led = IvfPqIndex.rawSink(root, 1L)
      .scan(s, Seq(("vec_id", Long.MinValue, Long.MaxValue)))
      .filter(col("vec_id") === 9100L)
      .select(col("embedding")).head().getSeq[Double](0)
    val orig = (0 until 64).map(i => (math.cos(9100L * 3.7 + i) * 0.9).toFloat.toDouble)
    assert(led === orig, "ledger holds a rotated frame — handoff would re-rotate it")
  }

  test("opq: handoff re-codes the ledger tail under the retrained rotation") {
    val s = spark
    import s.implicits._
    val fixture = java.nio.file.Files.createTempDirectory("ivfpq_opq_fixture").toString
    val root = tmpRoot("opq_handoff")
    def writeCorpus(scale: Double): Unit =
      (0L until 64L).map { id =>
        (id, (0 until 64).map(i =>
          (math.sin(id * 7.3 + i * 1.9) * scale).toFloat), (id % 16).toInt)
      }.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$fixture/embeddings.parquet")
    writeCorpus(1.0)
    assert(IvfPqIndex.ensure(s, fixture, root, flavor = IvfPqIndex.Opq).contains(1L))
    val novel = (9200L until 9204L).map { id =>
      (id, (0 until 64).map(i => (math.cos(id * 3.7 + i) * 0.9).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    IvfPqIndex.addVectors(s, root, novel, batchId = 1L)
    // refreshed corpus (retrains mean/component -> a DIFFERENT rotation)
    writeCorpus(0.5)
    assert(IvfPqIndex.handoff(s, fixture, root, flavor = IvfPqIndex.Opq).contains(2L))
    assert(new java.io.File(s"$root/g2/rotation").exists())
    // the carried tail is coded under generation 2's NEW rotation — the
    // reason the ledger stores pre-rotation vectors
    val carried = IvfPqIndex.codedSink(root, 2L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .filter(col("vec_id") >= 9200L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(carried.size === 4, s"handoff lost carried vectors: $carried")
    assert(carried === opqExpectedCodes(s, root, 2L, novel))
    // and the rotations genuinely differ across the swap (retrained)
    def rotOf(g: Long) = s.read.parquet(s"$root/g$g/rotation").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rotOf(1L) !== rotOf(2L), "handoff reused the stale rotation")
  }

  /** Expected (vec_id, cell, codes) for novel vectors under an OPQRES
    * generation's persisted model: RAW-vector assignment (the ordering's
    * point — cells never see the rotation), then the residual centered +
    * reflected with the persisted model, then the persisted codebook. */
  private def opqresExpectedCodes(s: org.apache.spark.sql.SparkSession,
      root: String, g: Long,
      vecs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] = {
    val rot = s.read.parquet(s"$root/g$g/rotation").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rot.length === 64, "rotation table must hold 64 (i, m, u) rows")
    val cents = s.read.parquet(s"$root/g$g/centroids")
    val cbRows = s.read.parquet(s"$root/g$g/codebook").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toSeq)).toMap
    val cb = Seq.tabulate(8)(j => Seq.tabulate(16)(c => cbRows((j, c))))
    val prep = vecs
      .withColumn("ed", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm",
        sqrt(graft.functions.GraftFunctions.vecDot(col("ed"), col("ed"))))
    val assigned = EmbeddingOps.ivfAssign(prep, cents, maxRank = 1)
    EmbeddingOps.opqRotateColumn(assigned, "rv",
        rot.map(_._2).toSeq, rot.map(_._3).toSeq)
      .select(col("vec_id"), col("cell"),
        graft.functions.GraftFunctions.pqCodes(col("rv"), cb).as("codes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("opqres: persisted residual-rotated index equals the in-query sibling; partition matches the plain flavor") {
    val s = spark
    val root = tmpRoot("opqres_eq")
    assert(IvfPqIndex.ensure(s, sfDir, root,
      flavor = IvfPqIndex.OpqResidual).contains(1L))
    assert(new java.io.File(s"$root/g1/rotation").exists())
    assert(new java.io.File(s"$root/g1/flavor").exists())
    val st = IvfPqIndex.stats(s, root).get
    assert(st.opq && st.flavor === "opqres", s"stats missed the flavor: $st")
    // build-once: a second ensure of the same flavor reuses generation 1
    assert(IvfPqIndex.ensure(s, sfDir, root,
      flavor = IvfPqIndex.OpqResidual).contains(1L))
    val indexed = rows(IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3))
    val sibling = rows(EmbeddingOps.opqResidualKnn(s, sfDir, 2, 3))
    assert(sibling.nonEmpty, "vacuous — residual-OPQ sibling returned nothing")
    assert(indexed === sibling,
      s"only-indexed=${(indexed -- sibling).take(3)} only-sibling=${(sibling -- indexed).take(3)}")
    assert(rows(IvfPqIndex.query(s, sfDir, root, nprobe = 4, k = 3)) ===
      rows(EmbeddingOps.opqResidualKnn(s, sfDir, 4, 3)))
    // the ordering's construction claim, pinned on the ARTIFACTS: the
    // opqres generation's (vec_id -> cell) partition is IDENTICAL to the
    // plain flavor's (rotation never touches assignment), while the
    // codes differ (rotation does touch what gets quantized)
    val plainRoot = tmpRoot("opqres_eq_plain")
    assert(IvfPqIndex.build(s, sfDir, plainRoot).contains(1L))
    def codedOf(r: String) = IvfPqIndex.codedSink(r, 1L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val resCoded = codedOf(root)
    val plainCoded = codedOf(plainRoot)
    assert(resCoded.map(t => (t._1, t._2)) === plainCoded.map(t => (t._1, t._2)),
      "residual flavor changed the coarse partition — the ordering is broken")
    assert(resCoded !== plainCoded,
      "residual rotation was a code-level no-op on the fixture — vacuous flavor")
  }

  test("opqres: addVectors codes under the frozen residual model; handoff re-codes the tail under the retrained one") {
    val s = spark
    import s.implicits._
    val fixture = java.nio.file.Files.createTempDirectory("ivfpq_opqres_fixture").toString
    val root = tmpRoot("opqres_handoff")
    def writeCorpus(scale: Double): Unit =
      (0L until 64L).map { id =>
        (id, (0 until 64).map(i =>
          (math.sin(id * 7.3 + i * 1.9) * scale).toFloat), (id % 16).toInt)
      }.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$fixture/embeddings.parquet")
    writeCorpus(1.0)
    assert(IvfPqIndex.ensure(s, fixture, root,
      flavor = IvfPqIndex.OpqResidual).contains(1L))
    val novel = (9300L until 9304L).map { id =>
      (id, (0 until 64).map(i => (math.cos(id * 3.7 + i) * 0.9).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    IvfPqIndex.addVectors(s, root, novel, batchId = 1L)
    val landed = IvfPqIndex.codedSink(root, 1L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .filter(col("vec_id") >= 9300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(landed.size === 4)
    assert(landed === opqresExpectedCodes(s, root, 1L, novel))
    // ledger stores the raw embedding (residual rotation never rides it)
    val led = IvfPqIndex.rawSink(root, 1L)
      .scan(s, Seq(("vec_id", Long.MinValue, Long.MaxValue)))
      .filter(col("vec_id") === 9300L)
      .select(col("embedding")).head().getSeq[Double](0)
    val orig = (0 until 64).map(i => (math.cos(9300L * 3.7 + i) * 0.9).toFloat.toDouble)
    assert(led === orig, "opqres ledger no longer holds the raw vector")
    // refreshed corpus -> retrained residual rotation; the carried tail
    // must be coded under generation 2's NEW model
    writeCorpus(0.5)
    assert(IvfPqIndex.handoff(s, fixture, root,
      flavor = IvfPqIndex.OpqResidual).contains(2L))
    assert(FsIo.readString(s"$root/g2/flavor").contains("opqres"))
    val carried = IvfPqIndex.codedSink(root, 2L)
      .scan(s, Seq(("cell", Long.MinValue, Long.MaxValue)))
      .filter(col("vec_id") >= 9300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(carried.size === 4, s"handoff lost carried vectors: $carried")
    assert(carried === opqresExpectedCodes(s, root, 2L, novel))
    def rotOf(g: Long) = s.read.parquet(s"$root/g$g/rotation").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rotOf(1L) !== rotOf(2L), "handoff reused the stale residual rotation")
  }

  test("filtered search: predicate-thinned candidates beat post-filtering an unfiltered top-k") {
    val s = spark
    val root = tmpRoot("filtered")
    assert(IvfPqIndex.ensure(s, sfDir, root).contains(1L))
    val attr = 7
    val labels = graft.Tables.t(s, sfDir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // SAME nprobe for both sides so the comparison isolates WHERE the
    // predicate is applied, not how many cells were probed
    val filtered = IvfPqIndex.queryFiltered(s, sfDir, root, nprobe = 2, k = 3, attrEq = attr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered.nonEmpty, "vacuous — no filtered candidates in probed cells")
    assert(filtered.forall { case (_, v) => labels(v) == attr },
      "filtered search returned a candidate with the wrong attr")
    val postFiltered = IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (_, v) => labels(v) == attr }.toSet
    // any attr-matching vector in the unfiltered top-3 ranks at least as
    // well among filtered candidates — so post-filtered is a subset ...
    assert(postFiltered.subsetOf(filtered),
      s"post-filter found pairs the filtered probe missed: ${postFiltered -- filtered}")
    // ... and a STRICT one here: most unfiltered winners carry other
    // attrs, so post-filtering under-returns — the reason the predicate
    // must reach the candidate scan
    assert(filtered.size > postFiltered.size,
      s"expected under-return from post-filtering: filtered=${filtered.size} post=${postFiltered.size}")
    // deeper probe (the selectivity overfetch lever) only adds candidates
    val deeper = IvfPqIndex.queryFiltered(s, sfDir, root, nprobe = 4, k = 3, attrEq = attr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deeper.size >= filtered.size)
    // the predicate reaches the parquet scan: PushedFilters carries the
    // attr equality (the inline-metadata design's whole point — at
    // 100 TB the row-group stats skip non-matching candidates before
    // decode, beside the manifest's cell pruning)
    val plan = IvfPqIndex.queryFiltered(s, sfDir, root, nprobe = 2, k = 3, attrEq = attr)
      .queryExecution.executedPlan.toString
    // the rendered PushedFilters list truncates at ~100 chars, so assert
    // on the visible prefix (attr leads the pushed list) + the scan-side
    // DataFilters carrying the equality
    assert(plan.contains("PushedFilters: [IsNotNull(attr)"),
      s"attr predicate did not reach the scan:\n${plan.linesIterator.filter(_.contains("Pushed")).mkString("\n")}")
    assert(plan.contains("(attr#") && plan.contains("= 7)"),
      "the attr equality is not in the scan-side data filters")
  }

  test("an unknown flavor marker fails loudly instead of probing as plain (ADVICE r17)") {
    val s = spark
    val root = tmpRoot("badflavor")
    assert(IvfPqIndex.build(s, sfDir, root).contains(1L))
    FsIo.writeStringAtomic(s"$root/g1/flavor", "opq-v9-from-the-future")
    // both the query and the add path read the marker; each must refuse
    // rather than silently run the unrotated arithmetic
    val eq = intercept[IllegalStateException] {
      IvfPqIndex.query(s, sfDir, root, nprobe = 2, k = 3).collect()
    }
    assert(eq.getMessage.contains("unknown flavor"), eq.getMessage)
    import s.implicits._
    val ea = intercept[IllegalStateException] {
      IvfPqIndex.addVectors(s, root,
        Seq((9400L, (0 until 64).map(i => (i + 1).toFloat)))
          .toDF("vec_id", "embedding"), batchId = 5L)
    }
    assert(ea.getMessage.contains("unknown flavor"), ea.getMessage)
  }
}
