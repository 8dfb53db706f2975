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
    * persisted indexes from older code must not satisfy [[ensure]]. */
  val FormatVersion = 1

  /** Committed generations GC'd past this many (newest kept). 2, not 1:
    * a reader that resolved just before a rebuild is still scanning the
    * previous generation's files. */
  val GenerationRetention = 2

  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    buildLocks.computeIfAbsent(root, _ => new Object)

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
    // bit_xor, not sum: order-independent like sum but cannot overflow
    // under ANSI arithmetic (sum of ~2^63-magnitude hashes throws)
    val r = graft.Tables.t(s, dir, "embeddings")
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(vec_id, embedding))"), lit(0L)).as("h"))
      .head()
    s"v$FormatVersion:n=${r.getLong(0)}:h=${r.getLong(1)}"
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
  def codedSink(root: String, g: Long): ManifestedParquetSink =
    new ManifestedParquetSink(
      dataDir = s"${genPath(root, g)}/coded",
      manifestDir = s"${genPath(root, g)}/coded_manifest",
      keyCols = Seq("cell", "vec_id"))

  /** TRAIN + ADD(corpus): build a brand-new committed generation from
    * the corpus at `dir`. None when the corpus lacks the model rows
    * (the sibling query's empty contract). Publish order: model tables,
    * coded batch 0, fingerprint, THEN the commit marker — a crash
    * anywhere before the marker leaves the previous generation live. */
  def build(s: SparkSession, dir: String, root: String): Option[Long] =
    lockFor(root).synchronized {
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
    * None = the corpus cannot carry an index (too few model rows). */
  def ensure(s: SparkSession, dir: String, root: String): Option[Long] =
    lockFor(root).synchronized {
      val fp = fingerprint(s, dir)
      currentGeneration(root) match {
        case Some(g)
          if FsIo.readString(s"${genPath(root, g)}/fingerprint").contains(fp) =>
          Some(g)
        case _ => build(s, dir, root)
      }
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
    val cb = readCodebook(s, root, g)
    val prep = vecs
      .withColumn("ed", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions.vecDot(col("ed"), col("ed"))))
    val coded = EmbeddingOps.ivfAssign(prep, centroids(s, root, g), maxRank = 1)
      .select(col("vec_id"), col("cell"),
        graft.functions.GraftFunctions.pqCodes(col("rv"), cb).as("codes"))
    codedSink(root, g).process(coded, batchId)
  }

  /** Streaming-ingest batch ids live above this base so they can never
    * collide with [[build]]'s corpus batch (id 0) or low-numbered manual
    * [[addVectors]] calls — the sink's idempotence marker is keyed by
    * batch id, and a collision would silently SKIP a distinct batch. */
  private[graft] val IngestBatchBase = 1L << 20

  /** Streaming ADD — the index's ingest path: land a vector stream
    * (vec_id, embedding) into the current generation's coded table,
    * one [[addVectors]] call per micro-batch. Exactly-once by the
    * sink's batch-keyed idempotence (a replayed micro-batch finds its
    * commit marker and skips; a crashed-mid-append batch is purged and
    * rewritten whole). The model is FROZEN per generation — ingest
    * never retrains; a scheduled [[ensure]] after the reference corpus
    * changes starts the next generation, exactly FAISS's add-vs-retrain
    * split. Composes with the sink's maintenance: versioned manifests
    * per batch, scanAsOf to pre-ingest snapshots, recluster-by-cell
    * when add-batch debris accumulates. Single writer per root
    * (Structured Streaming's one-active-query-per-checkpoint). */
  def startIngest(vecsStream: DataFrame,
      root: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecsStream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        addVectors(b.sparkSession, root, b, IngestBatchBase + id))
      .start()

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
    // bounded probe-plan collect: #queries x nprobe rows (<= 20 here) —
    // this is what turns the manifest's cell boxes into skipped files
    val probed = EmbeddingOps
      .ivfAssign(EmbeddingOps.prepped(s, dir).filter(col("vec_id") < 10),
        cents, maxRank = nprobe)
      .select(col("cell")).distinct().collect().map(_.getLong(0))
    if (probed.isEmpty) EmbeddingOps.ivfPqEmpty(s, dir)
    else {
      val coded = codedSink(root, g)
        .scan(s, Seq(("cell", probed.min, probed.max)))
      EmbeddingOps.ivfPqProbe(s, dir, cents, coded, cb, nprobe, k)
    }
  }
}
