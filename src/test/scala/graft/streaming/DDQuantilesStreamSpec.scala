package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming DDSketch dual vs its batch twin (q_dd_quantiles' core):
  * the sketch buffer round-trips through the streaming state store
  * across micro-batches, and because merge is count addition the
  * finalized window must equal the batch sketch over the same rows
  * BIT-FOR-BIT — not approximately — however the rows were split into
  * batches. Runs on the sf0.001 events fixture so the value/bucket
  * profile is the driver gate's, not a toy. */
class DDQuantilesStreamSpec extends SparkSpec {

  test("per-window stream quantiles equal the batch sketch bit-for-bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val events = graft.Tables.t(s, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    assert(events.length > 100, "fixture sanity")

    val in = MemoryStream[Ev]
    val q = StreamingPipelines.ddQuantilesStream(in.toDF(), size = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dd_stream").start()
    try {
      // three ts-ordered chunks: windows stay open ACROSS batch
      // boundaries, so the state-store merge path is genuinely exercised
      // (ts order keeps every row inside the watermark)
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // sentinel far past the fixture: closes every fixture window
      val last = events.last
      in.addData(Ev(last.event_id + 1,
        new Timestamp(last.ts.getTime + 86400L * 1000L), 1L, "zz_sentinel", 0.0))
      q.processAllAvailable()

      val stream = s.table("dd_stream")
        .where("event_type <> 'zz_sentinel'")
        .selectExpr("cast(win_start AS long)", "event_type", "n_vals", "q50", "q95", "q99")
        .as[(Long, String, Long, Double, Double, Double)].collect().toSet

      val batch = s.createDataset(events.toSeq).toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(graft.functions.GraftFunctions.ddSketch(col("value")).as("sk"))
        .selectExpr("cast(window.start AS long)", "event_type",
          "sk.n_vals", "sk.q50", "sk.q95", "sk.q99")
        .as[(Long, String, Long, Double, Double, Double)].collect().toSet

      assert(stream === batch,
        s"stream/batch sketch disagree: only-stream=${(stream -- batch).take(3)} " +
          s"only-batch=${(batch -- stream).take(3)}")
      assert(stream.nonEmpty)
    } finally q.stop()
  }

  test("sketch buffer survives a stop/restart checkpoint cycle mid-window") {
    val s = spark
    import s.implicits._
    val in = java.nio.file.Files.createTempDirectory("ddq-rec-in")
    val out = java.nio.file.Files.createTempDirectory("ddq-rec-out").toString
    val ck = java.nio.file.Files.createTempDirectory("ddq-rec-ck").toString
    def ev(id: Long, sec: Long, v: Double): Ev =
      Ev(id, new Timestamp(sec * 1000L), 1L, "click", v)
    def write(name: String, evs: Seq[Ev]): Unit =
      java.nio.file.Files.writeString(in.resolve(name),
        evs.map(Generators.toCsvLine).mkString("", "\n", "\n"))
    def start() = Sinks.file(StreamingPipelines.ddQuantilesStream(
      StreamingPipelines.textFileSource(s, in.toString), size = "1 hour"), out, ck)

    // phase 1: three values land in window [0, 1h); the window stays open
    val p1 = Seq(ev(1, 100, 100.0), ev(2, 200, 900.0), ev(3, 300, 40000.0))
    write("f0.csv", p1)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // phase 2, new query on the same checkpoint: two more values join the
    // SAME window from the RESTORED sketch, then a far-future row closes
    // it. A reset buffer would report n_vals = 2; the restored one folds
    // all five values and must equal the batch sketch bit-for-bit.
    val p2 = Seq(ev(4, 400, 7.0), ev(5, 500, 123456.0))
    write("f1.csv", p2 :+ ev(6, 86400, 0.0))
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val stream = s.read.parquet(out)
      .where("cast(win_start AS long) = 0")
      .selectExpr("n_vals", "q50", "q95", "q99")
      .as[(Long, Double, Double, Double)].collect().toSet
    val batch = s.createDataset(p1 ++ p2).toDF()
      .agg(graft.functions.GraftFunctions.ddSketch(col("value")).as("sk"))
      .selectExpr("sk.n_vals", "sk.q50", "sk.q95", "sk.q99")
      .as[(Long, Double, Double, Double)].collect().toSet
    assert(stream === batch, s"restored sketch wrong: stream=$stream batch=$batch")
    assert(stream.head._1 === 5L)
  }

  test("per-window HLL++ distinct equals the batch estimate bit-for-bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val events = graft.Tables.t(s, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))

    val in = MemoryStream[Ev]
    val q = StreamingPipelines.hllDistinctStream(in.toDF(), size = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("hll_stream").start()
    try {
      // same cross-batch discipline as the sketch test: HLL++ register
      // state must survive the state store and merge by max
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val last = events.last
      in.addData(Ev(last.event_id + 1,
        new Timestamp(last.ts.getTime + 86400L * 1000L), 1L, "zz_sentinel", 0.0))
      q.processAllAvailable()

      val stream = s.table("hll_stream")
        .where("event_type <> 'zz_sentinel'")
        .selectExpr("cast(win_start AS long)", "event_type", "approx_users")
        .as[(Long, String, Long)].collect().toSet

      val batch = s.createDataset(events.toSeq).toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .selectExpr("cast(window.start AS long)", "event_type", "approx_users")
        .as[(Long, String, Long)].collect().toSet

      assert(stream === batch,
        s"stream/batch HLL disagree: only-stream=${(stream -- batch).take(3)} " +
          s"only-batch=${(batch -- stream).take(3)}")
      assert(stream.nonEmpty)
    } finally q.stop()
  }
}
