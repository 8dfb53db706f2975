package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{FsIo, ManifestedParquetSink}

/** Persisted trained IVF-PQ index — FAISS's train / add / search
  * lifecycle as lakehouse tables (round-15 verdict task 1).
  *
  * The in-query sibling (e_knn_ivfpq_trained) re-trains its coarse
  * centroids and residual codebook on EVERY invocation — ~2 extra
  * corpus scans per query, the right shape for a one-shot ad-hoc query
  * but not for production ANN, where an index is built once (or
  * refreshed on a schedule) and queried many times. This object
  * materializes [[EmbeddingOps.ivfPqTrainParts]]'s output as parquet:
  *
  * ```
  *   <root>/g<N>/centroids/          16 rows: cid, ce, cn
  *   <root>/g<N>/codebook/          128 rows: j, c, cv
  *   <root>/g<N>/coded/              the coded corpus (vec_id, cell, codes),
  *                                   a [[ManifestedParquetSink]] data dir
  *   <root>/g<N>/coded_manifest/     its versioned manifests (cell min/max
  *                                   per file -> probe-time file skipping)
  *   <root>/g<N>/fingerprint         source-corpus fingerprint
  *   <root>/g<N>/_graft_ok           create-once commit marker
  * ```
  *
  * Generations (`g1, g2, ...`) are the RETRAIN axis: a rebuild publishes
  * a whole new immutable generation under the manifested-sink commit
  * protocol (marker lands last; readers resolve the highest committed
  * generation; older generations are GC'd past a retention of 2), so a
  * reader racing a rebuild sees either the old complete index or the new
  * one, never a half-written mix of new codebook and old codes. WITHIN a
  * generation, [[addVectors]] is the ADD axis: new vectors are coded
  * with the frozen model (assignment + encode are the training
  * trajectory's own expressions, so an added vector gets byte-identical
  * codes to what a full rebuild would give it) and appended as the
  * sink's next batch — which buys the sink's whole maintenance story for
  * free: versioned manifests, scanAsOf time travel to any retained
  * pre-add snapshot, recluster-by-cell when add-batch debris accumulates.
  *
  * Scale shape (100 TB): the model side is 144 tiny rows; build cost is
  * the training scans the sibling pays per query, paid ONCE; query cost
  * is ONE manifest-pruned scan of the coded table (8 bytes/vector) — the
  * probe collects nothing and shuffles nothing (cell-equi broadcast
  * join). The coded table's manifest carries per-file cell bounds, so a
  * low-nprobe probe on a recluster-maintained index reads only the files
  * its probed cells intersect.
  *
  * Staleness: the fingerprint (row count + order-independent xxhash64 of
  * (vec_id, embedding), + a format version bumped on any trajectory
  * change) is checked by [[ensure]]; a changed source corpus or stale
  * format rebuilds. Builds are serialized per root within the JVM
  * (ConcurrentBench runs queries in threads); cross-process concurrent
  * builds are out of contract, like every single-writer path here.
  */
object IvfPqIndex {

  /** Bump on ANY change to the training trajectory or on-disk layout:
    * persisted indexes from older code must not satisfy [[ensure]].
    * v2: generations carry `baseline_resid` (the drift monitor's
    * build-time reference). */
  val FormatVersion = 2

  /** Committed generations GC'd past this many (newest kept). 2, not 1:
    * a reader that resolved just before a rebuild is still scanning the
    * previous generation's files. */
  val GenerationRetention = 2

  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    buildLocks.computeIfAbsent(root, _ => new Object)

  /** Serialize index builds on `root` across THREADS (the JVM map —
    * ConcurrentBench runs queries concurrently) AND across PROCESSES
    * (an OS file lock on `root/.build_lock` — the registered query
    * derives a machine-global /tmp root from the fixture dir, so two
    * JVMs, e.g. a bench and a verify replica, can race the same root;
    * without the lock both would compute generation 1 and interleave
    * renames into one corrupt-but-committed artifact). The JVM monitor
    * wraps the file lock because FileChannel locks are held per-JVM
    * and re-acquiring one from a second thread throws. Non-local roots
    * (no NIO filesystem path) fall back to the JVM lock alone — the
    * documented single-writer-per-root contract covers them. */
  private def withBuildLock[A](root: String)(f: => A): A =
    lockFor(root).synchronized {
      val lockCh =
        try {
          val p = java.nio.file.Paths.get(root)
          java.nio.file.Files.createDirectories(p)
          Some(java.nio.channels.FileChannel.open(p.resolve(".build_lock"),
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE))
        } catch { case _: Exception => None }
      lockCh match {
        case Some(ch) =>
          try { val l = ch.lock(); try f finally l.release() }
          finally ch.close()
        case None => f
      }
    }

  /** Deterministic default root per source dir (the LayoutQueries
    * workDir convention) — under java.io.tmpdir, never in the read-only
    * fixture tree. */
  def defaultRoot(dir: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") +
      "/graft_ivfpq_index_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Source-corpus fingerprint: count + order-independent content hash.
    * ONE narrow aggregation over (vec_id, embedding) — cheap next to
    * a build, and content-sensitive enough that a regenerated fixture
    * with equal row count still misses. */
  private def fingerprint(s: SparkSession, dir: String): String = {
    // DECIMAL(38,0) sum of the row hashes: order-independent AND
    // multiplicity-sensitive. bit_xor would self-cancel any row with
    // even multiplicity (swap duplicate pair {A,A} for {B,B} and the
    // xor is unchanged — a silent stale-index reuse); a BIGINT sum of
    // ~2^63-magnitude hashes throws under ANSI arithmetic. 38 digits
    // hold ~10^19 rows of headroom above the hash magnitude.
    val r = graft.Tables.t(s, dir, "embeddings")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("vec_id"), col("embedding"))
          .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("h"))
      .head()
    s"v$FormatVersion:n=${r.getLong(0)}:h=${r.getDecimal(1)}"
  }

  private def genPath(root: String, g: Long) = s"$root/g$g"
  private val genRe = "^g(\\d+)$".r

  private def listGens(root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = FsIo.fs(p)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap(s => s.getPath.getName match {
      case genRe(n) => Some(n.toLong)
      case _ => None
    })
  }

  private def isCommitted(root: String, g: Long): Boolean =
    FsIo.fs(new org.apache.hadoop.fs.Path(root))
      .exists(new org.apache.hadoop.fs.Path(s"${genPath(root, g)}/_graft_ok"))

  /** The highest COMMITTED generation, if any — same marker protocol as
    * the manifested sink's versioned publish. */
  def currentGeneration(root: String): Option[Long] =
    listGens(root).filter(isCommitted(root, _)).sorted.lastOption

  /** The coded-corpus sink of one generation — the index's big table
    * lives behind the manifested sink so adds/maintenance/time travel
    * are the sink's proven machinery, not new code. keyCols =
    * (cell, vec_id): per-file CELL bounds are what probe-time pruning
    * uses; vec_id bounds ride along (the z-order maintenance writer
    * wants >= 2 keys, and id-ranged maintenance scans get skipping for
    * free). */
  def codedSink(root: String, g: Long,
      autoReclusterAt: Option[Int] = None,
      reclusterFiles: Int = 8,
      reclusterBuckets: Int = 4096): ManifestedParquetSink =
    new ManifestedParquetSink(
      dataDir = s"${genPath(root, g)}/coded",
      manifestDir = s"${genPath(root, g)}/coded_manifest",
      keyCols = Seq("cell", "vec_id"),
      autoReclusterAt = autoReclusterAt,
      reclusterFiles = reclusterFiles,
      reclusterBuckets = reclusterBuckets)

  /** TRAIN + ADD(corpus): build a brand-new committed generation from
    * the corpus at `dir`. None when the corpus lacks the model rows
    * (the sibling query's empty contract). Publish order: model tables,
    * coded batch 0, fingerprint, THEN the commit marker — a crash
    * anywhere before the marker leaves the previous generation live. */
  def build(s: SparkSession, dir: String, root: String): Option[Long] =
    withBuildLock(root) { buildLocked(s, dir, root) }

  private def buildLocked(s: SparkSession, dir: String, root: String): Option[Long] =
    {
      EmbeddingOps.ivfPqTrainParts(s, dir).map { parts =>
        val next = (listGens(root) :+ 0L).max + 1
        val g = genPath(root, next)
        parts.cents.coalesce(1).write.mode("overwrite").parquet(s"$g/centroids")
        val cbRows = for {
          j <- parts.cb.indices; c <- parts.cb(j).indices
        } yield (j, c, parts.cb(j)(c))
        import s.implicits._
        cbRows.toDF("j", "c", "cv").coalesce(1)
          .write.mode("overwrite").parquet(s"$g/codebook")
        codedSink(root, next).process(parts.coded, batchId = 0L)
        // build-time drift baseline: the corpus' mean residual norm
        // against the frozen coarse model (6dp), read off the PINNED
        // assignment frame training already materialized — one tiny
        // agg, never a second corpus join. [[startIngest]]'s drift
        // monitor prices arriving batches against it.
        val baseline = parts.assigned
          .agg(round(avg(sqrt(graft.functions.GraftFunctions.vecDot(col("rv"), col("rv")))), 6))
          .head().getDouble(0)
        FsIo.writeStringAtomic(s"$g/baseline_resid", baseline.toString)
        FsIo.writeStringAtomic(s"$g/fingerprint", fingerprint(s, dir))
        FsIo.writeStringAtomic(s"$g/_graft_ok", next.toString)
        // GC: committed generations past retention + uncommitted debris
        // older than the one just published (a crashed build's leftovers)
        val all = listGens(root)
        val keep = all.filter(isCommitted(root, _)).sorted
          .takeRight(GenerationRetention).toSet
        val fs = FsIo.fs(new org.apache.hadoop.fs.Path(root))
        all.filterNot(keep).foreach(g0 => fs.delete(
          new org.apache.hadoop.fs.Path(genPath(root, g0)), true))
        next
      }
    }

  /** Build-once gate: reuse the current committed generation when its
    * fingerprint still matches the source corpus, else (re)build.
    * None = the corpus cannot carry an index (too few model rows).
    * The fingerprint check runs INSIDE the build lock (double-checked):
    * a second process that blocked on a concurrent build re-reads the
    * now-committed generation and reuses it instead of building again. */
  def ensure(s: SparkSession, dir: String, root: String): Option[Long] = {
    val fp = fingerprint(s, dir)
    def fresh(): Option[Long] = currentGeneration(root).filter(g =>
      FsIo.readString(s"${genPath(root, g)}/fingerprint").contains(fp))
    fresh().orElse(withBuildLock(root) {
      fresh().orElse(buildLocked(s, dir, root))
    })
  }

  private def readCodebook(s: SparkSession, root: String, g: Long): Seq[Seq[Seq[Double]]] = {
    val rows = s.read.parquet(s"${genPath(root, g)}/codebook").collect()
    Seq.tabulate(8) { j =>
      Seq.tabulate(16) { c =>
        rows.find(r => r.getInt(0) == j && r.getInt(1) == c)
          .getOrElse(throw new IllegalStateException(
            s"IvfPqIndex: codebook at $root g$g is missing (j=$j, c=$c)"))
          .getSeq[Double](2).toSeq
      }
    }
  }

  private def centroids(s: SparkSession, root: String, g: Long): DataFrame =
    s.read.parquet(s"${genPath(root, g)}/centroids")

  /** ADD: code `vecs` (vec_id, embedding) with the current generation's
    * FROZEN model and append them as the coded sink's next batch.
    * Assignment + encode are [[EmbeddingOps.ivfAssign]] +
    * [[graft.functions.GraftFunctions.pqCodes]] — the training
    * trajectory's own expressions — so an added vector's row is
    * byte-identical to what a full rebuild would code it as. `batchId`
    * is the caller's ingest batch (the sink's idempotent-replay key). */
  def addVectors(s: SparkSession, root: String, vecs: DataFrame,
      batchId: Long): Unit = {
    val g = currentGeneration(root).getOrElse(throw new IllegalStateException(
      s"IvfPqIndex: no committed generation under $root — build first"))
    codedSink(root, g).process(
      codeWithModel(vecs, centroids(s, root, g), readCodebook(s, root, g)),
      batchId)
  }

  /** Code raw vectors (vec_id, embedding) with a frozen model: nearest-
    * cell assignment ([[EmbeddingOps.ivfAssign]], the one trajectory) +
    * PQ encode. Shared by [[addVectors]] and [[startIngest]]. */
  private def codeWithModel(vecs: DataFrame, cents: DataFrame,
      cb: Seq[Seq[Seq[Double]]]): DataFrame =
    codeWithModel0(vecs, cents)
      .select(col("vec_id"), col("cell"),
        graft.functions.GraftFunctions.pqCodes(col("rv"), cb).as("codes"))

  /** Streaming-ingest batch ids live in per-stream SLOTS of this size,
    * above [[build]]'s corpus batch (id 0) and low-numbered manual
    * [[addVectors]] calls — the sink's idempotence marker is keyed by
    * batch id, so any collision would silently SKIP a distinct batch.
    * A slot per stream (not one shared base): a SECOND ingest stream
    * with a fresh checkpoint restarts micro-batch ids at 0, and on a
    * shared base its first batches would find the first stream's
    * markers and vanish. */
  private[graft] val IngestSlotSize = 1L << 20

  /** The stable batch-id offset of one ingest stream, keyed by its
    * checkpoint location: slot assignment is a create-once marker file
    * under the generation (so a RESTART of the same checkpoint maps
    * replayed micro-batches to the SAME sink ids — the idempotence
    * contract — while a new checkpoint allocates the next slot). Slot
    * count is capped so ids stay within the sink's 9-digit marker
    * format. Allocation runs under the build lock; concurrent ingest
    * WRITERS on one root are out of contract anyway (single writer),
    * but two successive streams may allocate from different JVMs. */
  private def ingestOffset(root: String, g: Long, checkpointDir: String): Long = {
    val dir = s"${genPath(root, g)}/ingest_streams"
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    val marker = s"$dir/$h"
    FsIo.readString(marker) match {
      case Some(off) => off.trim.toLong
      case None => withBuildLock(root) {
        FsIo.readString(marker) match {
          case Some(off) => off.trim.toLong
          case None =>
            val fs = FsIo.fs(new org.apache.hadoop.fs.Path(dir))
            fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
            val used = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).length
            val slot = used + 1
            require(slot <= 900,
              s"IvfPqIndex: ingest-stream slots exhausted under $dir ($slot) — " +
                "batch ids would overflow the sink's 9-digit marker format")
            val off = IngestSlotSize * slot
            FsIo.writeStringAtomic(marker, off.toString)
            off
        }
      }
    }
  }

  /** Streaming ADD — the index's ingest path: land a vector stream
    * (vec_id, embedding) into the current generation's coded table,
    * one coded batch per micro-batch. Exactly-once by the sink's
    * batch-keyed idempotence (a replayed micro-batch finds its commit
    * marker and skips; a crashed-mid-append batch is purged and
    * rewritten whole); batch ids are offset into this stream's
    * [[ingestOffset]] slot so neither the build's corpus batch nor a
    * previous stream's batches can shadow them. The model is FROZEN
    * per generation — ingest never retrains; a scheduled [[ensure]]
    * after the reference corpus changes starts the next generation,
    * exactly FAISS's add-vs-retrain split. The stream is BOUND to the
    * generation it started on: every micro-batch re-checks the live
    * generation and fails LOUDLY if a rebuild superseded it (silently
    * appending to a superseded — eventually GC'd — generation would
    * lose every vector ingested after the swap). Composes with the
    * sink's maintenance: versioned manifests per batch, scanAsOf to
    * pre-ingest snapshots, and with `autoReclusterAt` an inline
    * recluster-by-cell between micro-batches (the single-writer-safe
    * point) once add-batch debris crosses the threshold. Opt-in drift
    * monitor (`driftAlertAt`): each batch's mean residual norm is
    * priced against the build-time baseline — residuals ARE the
    * model-fit signal (a frozen coarse model codes a drifted
    * distribution with growing residuals, which 4-bit PQ quantizes
    * badly; the RecallSweep misaligned lane prices the endpoint); a
    * breach writes the create-once `_drift_alert`. The POLICY stays
    * external: a retrain needs a refreshed reference corpus only the
    * operator can designate — detection is wired in, the rebuild
    * decision is not usurped. Single ACTIVE writer per root
    * (Structured Streaming's one-active-query-per-checkpoint). */
  def startIngest(vecsStream: DataFrame, root: String, checkpointDir: String,
      autoReclusterAt: Option[Int] = None,
      reclusterFiles: Int = 8,
      reclusterBuckets: Int = 4096,
      driftAlertAt: Option[Double] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val s = vecsStream.sparkSession
    val g = currentGeneration(root).getOrElse(throw new IllegalStateException(
      s"IvfPqIndex: no committed generation under $root — build first"))
    val off = ingestOffset(root, g, checkpointDir)
    // model read ONCE at stream start — frozen per generation by
    // contract, so per-batch re-reads would buy nothing
    val cents = centroids(s, root, g)
    val cb = readCodebook(s, root, g)
    val sink = codedSink(root, g, autoReclusterAt, reclusterFiles, reclusterBuckets)
    val baseline = driftAlertAt.map { _ =>
      FsIo.readString(s"${genPath(root, g)}/baseline_resid")
        .map(_.trim.toDouble)
        .getOrElse(throw new IllegalStateException(
          s"IvfPqIndex: driftAlertAt set but generation g$g has no " +
            "baseline_resid (built by an older format?) — rebuild first"))
    }
    val alertPath = s"${genPath(root, g)}/_drift_alert"
    vecsStream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val live = currentGeneration(root)
        if (!live.contains(g)) throw new IllegalStateException(
          s"IvfPqIndex: ingest stream is bound to generation g$g but the " +
            s"live generation is ${live.fold("<none>")(v => s"g$v")} — a " +
            "rebuild superseded it; stop this stream and start a new one " +
            "against the current generation")
        // ONE assignment job per batch: the monitored path persists the
        // assigned frame and derives both the PQ-encode projection and
        // the residual-norm agg from it (re-running the join+window per
        // batch would double the pinned-rate ingest lane's cost)
        if (driftAlertAt.isEmpty) {
          sink.process(codeWithModel(b, cents, cb), off + id)
        } else {
          val assigned = codeWithModel0(b, cents)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            sink.process(assigned.select(col("vec_id"), col("cell"),
              graft.functions.GraftFunctions.pqCodes(col("rv"), cb).as("codes")),
              off + id)
            for (t <- driftAlertAt; base <- baseline)
              if (FsIo.readString(alertPath).isEmpty) {
                val r = assigned
                  .agg(avg(sqrt(graft.functions.GraftFunctions.vecDot(col("rv"), col("rv")))))
                  .head()
                // zero baseline (a corpus the centroids fit exactly, to
                // 6dp) must not disable the monitor: ANY material
                // residual over a zero baseline is infinite drift
                val breach = !r.isNullAt(0) &&
                  (if (base > 0) r.getDouble(0) / base > t
                   else r.getDouble(0) > 1e-6)
                if (breach)
                  FsIo.writeStringAtomic(alertPath,
                    if (base > 0)
                      f"batch=${off + id} ratio=${r.getDouble(0) / base}%.4f"
                    else f"batch=${off + id} ratio=inf")
              }
          } finally { assigned.unpersist(); () }
        }
      }
      .start()
  }

  /** The generation's drift alert, if one fired: "batch=<sink batch id>
    * ratio=<mean-resid multiple of baseline>". Create-once — the FIRST
    * breaching batch wins; clearing it is a rebuild (new generation). */
  def driftAlert(root: String): Option[String] = for {
    g <- currentGeneration(root)
    a <- FsIo.readString(s"${genPath(root, g)}/_drift_alert")
  } yield a

  /** Assignment-only half of [[codeWithModel]] (vec_id, cell, rv) — the
    * drift monitor reads residual norms without paying the PQ encode. */
  private def codeWithModel0(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val prep = vecs
      .withColumn("ed", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions.vecDot(col("ed"), col("ed"))))
    EmbeddingOps.ivfAssign(prep, cents, maxRank = 1)
  }

  /** SEARCH: probe the persisted index with the source corpus' query
    * vectors (vec_id < 10) — nprobe cell ranking against the persisted
    * centroids, residual ADC against the persisted codes. The coded
    * scan goes through the sink's manifest, pruned to the probed cells'
    * range: on a cell-reclustered index, files outside the probed cell
    * span are never opened. */
  def query(s: SparkSession, dir: String, root: String,
      nprobe: Int, k: Int): DataFrame = {
    val g = currentGeneration(root).getOrElse(throw new IllegalStateException(
      s"IvfPqIndex: no committed generation under $root — build first"))
    val cents = centroids(s, root, g)
    val cb = readCodebook(s, root, g)
    // ONE query-side assignment job: the pinned frame feeds both the
    // bounded probe-plan collect (#queries x nprobe rows, <= 20 here —
    // what turns the manifest's cell boxes into skipped files) and the
    // broadcast probe side of the ADC join.
    val q = graft.Checkpoints.pin(
      EmbeddingOps.ivfPqQueryFrame(s, dir, cents, nprobe))
    val probed = q.select(col("cell")).distinct().collect().map(_.getLong(0))
    if (probed.isEmpty) EmbeddingOps.ivfPqEmpty(s, dir)
    else {
      // span bound, not per-cell union: on a recluster-maintained index
      // cells are contiguous on disk so the span is near-exact, and the
      // equi-join drops any in-span stragglers either way
      val coded = codedSink(root, g)
        .scan(s, Seq(("cell", probed.min, probed.max)))
      EmbeddingOps.ivfPqProbeWith(q, coded, cb, k)
    }
  }
}
