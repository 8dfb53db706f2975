package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** T5: a stopped query restarted on the same checkpoint must resume from
  * committed offsets — no reprocessing of consumed files, no duplicate
  * windows in the exactly-once file sink, prior window state recovered.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("file-sink window query recovers across a stop/start on one checkpoint") {
    val d = Jobs.Dirs(
      Files.createTempDirectory("ckpt-in").toString,
      Files.createTempDirectory("ckpt-out").toString,
      Files.createTempDirectory("ckpt-ck").toString)

    // Phase 1: events at 0..19 s then a watermark push to 100 s.
    Generators.writeCsvFiles(d.in, seed = 3, files = 1, perFile = 20)
    Files.writeString(java.nio.file.Paths.get(d.in, "advance1.csv"),
      "\"900\",\"100000000\",\"1\",\"click\",\"1.0\"\n")
    val q1 = Jobs.basicStreaming(spark, d)
    try q1.processAllAvailable() finally q1.stop()
    val afterPhase1 = spark.read.parquet(d.out).count()
    assert(afterPhase1 > 0)

    // Phase 2: NEW query object, same checkpoint. A later file closes the
    // 100 s window.
    Files.writeString(java.nio.file.Paths.get(d.in, "advance2.csv"),
      "\"901\",\"200000000\",\"1\",\"click\",\"1.0\"\n")
    val q2 = Jobs.basicStreaming(spark, d)
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(d.out)
    // the 100 s single-event window emitted exactly once post-restart
    assert(out.filter("cnt = 1 AND cast(win_start AS long) = 100").count() === 1)
    // no duplicated windows anywhere (exactly-once sink across restart)
    assert(out.groupBy("win_start").count().filter("count > 1").count() === 0)
    // phase-1 rows were not re-emitted
    assert(out.count() === afterPhase1 + 1)
  }
}
