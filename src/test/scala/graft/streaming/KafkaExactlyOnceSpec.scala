package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** K2 exactly-once parity ([[IdempotentKafkaSink]]): the reference's
  * transactional Kafka sink (EventTimeOperations.java:182-208,
  * DeliveryGuarantee.EXACTLY_ONCE) delivers each record once despite
  * crash/replay. The sandbox has no broker, so these tests inject an
  * in-process keyed store as the transport — exactly the dedup behavior
  * of a compacted topic / key-deduping consumer — and drive the
  * foreachBatch body batch-to-batch through forced "crashes" (fresh sink
  * instances on the same persisted state, mid-produce failures).
  */
class KafkaExactlyOnceSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "payload")
  }

  /** Keyed store standing in for a compacted topic: last write per key wins. */
  private final class TopicStore {
    val m = mutable.LinkedHashMap[String, String]()
    var produced = 0 // every send, including overwrites — measures raw volume
    def sink(keyed: DataFrame, id: Long): Unit =
      keyed.collect().foreach { r => m(r.getString(0)) = r.getString(1); produced += 1 }
  }

  test("record keys are deterministic across replays of the same batch") {
    val sink = new IdempotentKafkaSink((_, _) => ())
    val b = df((1L to 50L).map(i => (i, s"p$i")))
    val once = sink.keyed(b, 7L).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val twice = sink.keyed(b, 7L).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(once === twice)
    assert(once.size === 50) // keys distinct even for one batch
    // identical payload rows still get distinct keys (seq disambiguates)
    val dup = df(Seq((1L, "same"), (1L, "same"), (1L, "same")))
    assert(sink.keyed(dup, 0L).select("key").distinct().count() === 3)
    // a replay may arrive with DIFFERENT physical partitioning — keys are
    // a pure function of content (bucket hash + in-bucket content sort),
    // so a repartitioned identical batch frames identically
    val shuffled = sink.keyed(b.repartition(7), 7L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(shuffled === once)
  }

  test("fully-produced batch replayed after restart is skipped, not re-produced") {
    val ckpt = Files.createTempDirectory("kxo-ck").toString
    val store = new TopicStore
    val s1 = new IdempotentKafkaSink(store.sink)
    s1.initState(ckpt)
    s1.process(df(Seq((1L, "a"), (2L, "b"))), 0L)
    s1.process(df(Seq((3L, "c"))), 1L)
    assert(store.m.size === 3 && store.produced === 3)

    // "crash" after commit: new instance, same state dir, batch 1 replayed
    val s2 = new IdempotentKafkaSink(store.sink)
    s2.initState(ckpt)
    s2.process(df(Seq((3L, "c"))), 1L) // replay — must be skipped outright
    assert(store.produced === 3, "committed batch was re-produced")
    s2.process(df(Seq((4L, "d"))), 2L)
    assert(store.m.size === 4)
  }

  test("mid-produce crash replays with identical keys: store converges to exactly-once") {
    val ckpt = Files.createTempDirectory("kxo-ck2").toString
    val store = new TopicStore
    var failOnce = true
    val flaky: (DataFrame, Long) => Unit = { (keyed, id) =>
      if (failOnce && id == 1L) {
        // produce a partial prefix, then die before confirming
        keyed.limit(2).collect().foreach { r => store.m(r.getString(0)) = r.getString(1); store.produced += 1 }
        failOnce = false
        sys.error("broker connection lost")
      } else store.sink(keyed, id)
    }
    val s1 = new IdempotentKafkaSink(flaky)
    s1.initState(ckpt)
    s1.process(df(Seq((1L, "a"))), 0L)
    val batch1 = df((10L to 14L).map(i => (i, s"p$i")))
    intercept[RuntimeException](s1.process(batch1, 1L))

    // restart: commit watermark still at 0, batch 1 replays with the SAME
    // keys — the partial prefix is overwritten, never duplicated
    val s2 = new IdempotentKafkaSink(flaky)
    s2.initState(ckpt)
    s2.process(batch1, 1L)
    assert(store.m.size === 6, "keyed store must converge to one record per row")
    val payloads = store.m.values.toSeq
    assert(payloads.distinct.size === payloads.size)
    // raw produce volume shows the replay happened (at-least-once wire,
    // exactly-once content): 1 + 2 (partial) + 5 (full replay)
    assert(store.produced === 8)
  }

  test("end-to-end through a streaming query with restart on one checkpoint") {
    val ckpt = Files.createTempDirectory("kxo-ck3").toString
    val in = Files.createTempDirectory("kxo-in").toString
    val store = new TopicStore

    Generators.writeCsvFiles(in, seed = 11, files = 2, perFile = 25)
    val sink1 = new IdempotentKafkaSink(store.sink)
    val q1 = sink1.start(spark.readStream.text(in), ckpt)
    try q1.processAllAvailable() finally q1.stop()
    val afterPhase1 = store.m.size
    assert(afterPhase1 === 50)

    // restart on the same checkpoint: consumed files are not re-produced
    Files.writeString(java.nio.file.Paths.get(in, "extra.csv"),
      (1 to 5).map(i => s""""90$i","${i}000000","7","click","1.0"""").mkString("", "\n", "\n"))
    val sink2 = new IdempotentKafkaSink(store.sink)
    val q2 = sink2.start(spark.readStream.text(in), ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(store.m.size === 55)
    assert(store.produced === 55, "restart re-produced already-committed batches")
  }
}
