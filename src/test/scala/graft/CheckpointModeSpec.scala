package graft

import java.nio.file.Files

/** The cluster-mode checkpoint knob: `spark.graft.checkpoint.mode=reliable`
  * must route every [[Checkpoints.pin]] site through a replayable
  * `checkpoint(dir)` and produce results IDENTICAL to the default
  * local-mode pins. Proven on the two heaviest pin users: the iterative
  * connected-components query (d_dedup_groups — a pin per propagation
  * round) and the multi-consumer survivor pipeline (d_curate_corpus). */
class CheckpointModeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def canonical(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect().map(_.toString).sorted.toSeq
  }

  private def withMode[A](mode: String)(body: => A): A = {
    // d_dedup_groups / d_curate_corpus artifacts may be memoized from an
    // earlier invocation in this shared session (CorpusCache, round 19);
    // every mode assertion must actually drive Checkpoints.pin, so each
    // run starts from a cold cache.
    CorpusCache.clear()
    val prev = spark.conf.getOption(Checkpoints.ModeKey)
    try { spark.conf.set(Checkpoints.ModeKey, mode); body }
    finally {
      prev match {
        case Some(v) => spark.conf.set(Checkpoints.ModeKey, v)
        case None => spark.conf.unset(Checkpoints.ModeKey)
      }
    }
  }

  test("reliable mode matches local mode bit-for-bit on iterative + multi-consumer queries") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    for (name <- Seq("d_dedup_groups", "d_curate_corpus")) {
      val localRows = withMode("local") { canonical(name) }
      val reliableRows = withMode("reliable") { canonical(name) }
      assert(localRows.nonEmpty, s"$name returned no rows — vacuous compare")
      assert(reliableRows == localRows, s"$name differs between checkpoint modes")
    }
    // Reliable mode actually wrote checkpoint data to the configured dir.
    val wrote = Files.walk(java.nio.file.Paths.get(dir)).filter(Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable mode produced no checkpoint files")
  }

  test("reliable mode without a dir fails loudly") {
    // Fresh key state: no DirKey, no pre-set SparkContext checkpoint dir.
    val prev = spark.conf.getOption(Checkpoints.DirKey)
    spark.conf.unset(Checkpoints.DirKey)
    try {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val e = intercept[IllegalArgumentException] {
          withMode("reliable") { canonical("d_dedup_groups") }
        }
        assert(e.getMessage.contains(Checkpoints.DirKey))
      }
    } finally prev.foreach(spark.conf.set(Checkpoints.DirKey, _))
  }

  test("unknown mode fails loudly") {
    val e = intercept[IllegalArgumentException] {
      withMode("banana") { canonical("d_dedup_groups") }
    }
    assert(e.getMessage.contains("banana"))
  }
}
