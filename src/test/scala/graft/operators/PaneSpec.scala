package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.{Ev, StreamingPipelines}

/** The pane-shared sliding sketches must deliver both halves of their
  * claim: (1) bit-identical estimates to the naive row-replicating
  * plan — merge-order invariance is what LICENSES the pane shortcut;
  * (2) the pane PLAN SHAPE — raw rows aggregate before the window
  * explosion (the explosion's input is sketch cells), where the naive
  * plan explodes raw rows first. And the streaming dual (chained
  * watermarked aggregations) must equal the batch query on finalized
  * windows. */
class PaneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def events = graft.Tables.t(spark, sfDir, "events")

  test("pane DDSketch quantiles == naive row-replicating plan, bit-for-bit") {
    val pane = PaneOps.slidingDdQuantilesPane(events)
      .orderBy("event_type", "win_start").collect().toSeq
    val naive = PaneOps.slidingDdQuantilesNaive(events)
      .orderBy("event_type", "win_start").collect().toSeq
    assert(pane.nonEmpty, "vacuous — no windows")
    assert(pane === naive)
  }

  test("pane HLL distinct == naive row-replicating plan, bit-for-bit") {
    val pane = PaneOps.slidingHllDistinctPane(events)
      .orderBy("event_type", "win_start").collect().toSeq
    val naive = PaneOps.slidingHllDistinctNaive(events)
      .orderBy("event_type", "win_start").collect().toSeq
    assert(pane.nonEmpty, "vacuous — no windows")
    assert(pane === naive)
  }

  /** Does any Generate (the window explosion) in the optimized plan have
    * an Aggregate BELOW it (i.e. the explosion consumes aggregated pane
    * cells, not raw rows)? */
  private def explodesAggregated(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case g: Generate => g }
      .exists(g => g.child.collect { case a: Aggregate => a }.nonEmpty)

  test("pane exact top-k == naive row-replicating plan") {
    val pane = PaneOps.slidingTopkPane(events)
      .orderBy("win_start", "rnk").collect().toSeq
    val naive = PaneOps.slidingTopkNaive(events)
      .orderBy("win_start", "rnk").collect().toSeq
    assert(pane.nonEmpty, "vacuous — no windows")
    assert(pane === naive)
  }

  test("plan shape: pane plans explode sketch cells; naive plans explode raw rows") {
    assert(explodesAggregated(PaneOps.slidingDdQuantilesPane(events)),
      "pane DD plan lost its pre-explosion aggregate — raw rows would replicate k×")
    assert(!explodesAggregated(PaneOps.slidingDdQuantilesNaive(events)),
      "naive DD plan unexpectedly aggregates before exploding — A/B receipt is comparing pane to pane")
    assert(explodesAggregated(PaneOps.slidingHllDistinctPane(events)),
      "pane HLL plan lost its pre-explosion aggregate")
    assert(!explodesAggregated(PaneOps.slidingHllDistinctNaive(events)),
      "naive HLL plan unexpectedly aggregates before exploding")
    assert(explodesAggregated(PaneOps.slidingTopkPane(events)),
      "pane top-k plan lost its pre-explosion aggregate")
    assert(!explodesAggregated(PaneOps.slidingTopkNaive(events)),
      "naive top-k plan unexpectedly aggregates before exploding")
  }

  test("PaneParams validates and derives k; k=12 hourly/5-min pane == naive") {
    import PaneOps.PaneParams
    assertThrows[IllegalArgumentException](PaneParams(7200000000L, 1700000000L))
    assertThrows[IllegalArgumentException](PaneParams(-1L, 1800000000L))
    val p12 = PaneParams.ofMinutes(60, 5)
    assert(p12.k === 12)
    val pane = PaneOps.slidingTopkPane(events, 5, p12)
      .orderBy("win_start", "rnk").collect().toSeq
    val naive = PaneOps.slidingTopkNaive(events, 5, p12)
      .orderBy("win_start", "rnk").collect().toSeq
    assert(pane.nonEmpty && pane === naive)
    val dd = PaneOps.slidingDdQuantilesPane(events, p12)
      .orderBy("event_type", "win_start").collect().toSeq
    val ddN = PaneOps.slidingDdQuantilesNaive(events, p12)
      .orderBy("event_type", "win_start").collect().toSeq
    assert(dd.nonEmpty && dd === ddN)
  }

  test("pane assignment FLOORS on pre-1970 timestamps, agreeing with window()") {
    // ADVICE r10: `unix_micros(ts) div slide` truncates toward zero, so
    // negative micros landed one pane HIGH vs the streaming dual's
    // window() and the oracle's DuckDB `//` (both floor).
    val s = spark
    import s.implicits._
    val ts = Seq("1969-12-31 23:45:00", "1969-12-31 22:10:00", "1970-01-01 00:20:00")
      .map(java.sql.Timestamp.valueOf)
    val df = ts.map(t => Tuple1(t)).toDF("ts")
    val viaPane = df
      .selectExpr(s"${PaneOps.PaneParams.default.paneExpr()} AS pane", "ts")
      .select(org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("pane")).as("pane_ts"), $"ts")
    val viaWindow = df.select(
      org.apache.spark.sql.functions.window($"ts", "30 minutes")("start").as("pane_ts"), $"ts")
    assert(viaPane.collect().toSet === viaWindow.collect().toSet)
  }

  test("w2e approximate top-k: pane plan shape + candidates cover the exact winners here") {
    assert(explodesAggregated(PaneOps.slidingTopkCmsPane(events)),
      "w2e lost its pre-explosion aggregates — raw rows would replicate k×")
    // on this small fixture every pane's top-15 covers each window's
    // exact top-5, and CMS estimates are upper bounds — the approximate
    // ids can only differ where estimates collide; assert the id SETS
    // per window are plausible: every exact top-1 must appear in the
    // approximate top-5 (a total miss would mean the candidate union or
    // the estimator is broken, not a collision artifact)
    val exact1 = PaneOps.slidingTopkPane(events).filter("rnk = 1")
      .select("win_start", "user_id").collect().map(r => (r.get(0), r.getLong(1))).toSet
    val approx = PaneOps.slidingTopkCmsPane(events)
      .select("win_start", "user_id").collect().map(r => (r.get(0), r.getLong(1))).toSet
    assert(exact1.subsetOf(approx),
      s"exact winners missing from approximate top-5: ${(exact1 -- approx).take(3)}")
  }

  test("streaming pane top-k (three chained stateful ops) matches the batch query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val fixture = events
      .selectExpr("event_id", "ts", "user_id", "event_type", "cast(value AS double) AS value")
      .orderBy("ts", "event_id").as[Ev].collect().toSeq
    val maxTs = fixture.map(_.ts.getTime).max
    val maxId = fixture.map(_.event_id).max
    val flush = Ev(maxId + 1, new Timestamp(maxTs + 86400000L), 1L, "click", 1.0)

    val in = MemoryStream[Ev]
    val q = StreamingPipelines.slidingTopkPaneStream(in.toDF())
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("panetopk-ck").toString)
      .format("memory").queryName("panetopk_stream").start()
    try {
      in.addData(fixture); in.addData(flush)
      q.processAllAvailable()
      val stream = s.table("panetopk_stream")
        .selectExpr("unix_micros(win_start)", "user_id", "cnt", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = PaneOps.slidingTopkPane(events)
        .selectExpr("unix_micros(win_start)", "user_id", "cnt", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
      assert(batch.nonEmpty, "vacuous — no finalized windows")
    } finally q.stop()
  }

  test("streaming w2e dual (candidates + CMS, four chained stateful ops) matches batch") {
    // verdict r11 task 2: the newest registered query regains its
    // batch↔stream twin. Bit-equality is the claim — same panes, same
    // md5-salted buckets, same min-over-depth estimator, same tiebreak.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val fixture = events
      .selectExpr("event_id", "ts", "user_id", "event_type", "cast(value AS double) AS value")
      .orderBy("ts", "event_id").as[Ev].collect().toSeq
    val maxTs = fixture.map(_.ts.getTime).max
    val maxId = fixture.map(_.event_id).max
    val flush = Ev(maxId + 1, new Timestamp(maxTs + 86400000L), 1L, "click", 1.0)

    val in = MemoryStream[Ev]
    val q = StreamingPipelines.slidingTopkCmsPaneStream(in.toDF())
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("panecms-ck").toString)
      .format("memory").queryName("panecms_stream").start()
    try {
      in.addData(fixture); in.addData(flush)
      q.processAllAvailable()
      val stream = s.table("panecms_stream")
        .selectExpr("unix_micros(win_start)", "user_id", "est", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = PaneOps.slidingTopkCmsPane(events)
        .selectExpr("unix_micros(win_start)", "user_id", "est", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
      assert(batch.nonEmpty, "vacuous — no finalized windows")
    } finally q.stop()
  }

  test("streaming pane dual matches the batch query on finalized windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val fixture = events
      .selectExpr("event_id", "ts", "user_id", "event_type", "cast(value AS double) AS value")
      .orderBy("ts", "event_id").as[Ev].collect().toSeq
    // a flush event one day past the fixture advances the watermark past
    // every fixture window's end; its own windows stay open and unemitted
    val maxTs = fixture.map(_.ts.getTime).max
    val maxId = fixture.map(_.event_id).max
    val flush = Ev(maxId + 1, new Timestamp(maxTs + 86400000L), 1L, "click", 1.0)

    val in = MemoryStream[Ev]
    val q = StreamingPipelines.slidingDdQuantilesPaneStream(in.toDF())
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("pane-ck").toString)
      .format("memory").queryName("pane_stream").start()
    try {
      in.addData(fixture); in.addData(flush)
      q.processAllAvailable()
      val stream = s.table("pane_stream")
        .selectExpr("event_type", "unix_micros(win_start)", "n_vals", "q50", "q95", "q99")
        .as[(String, Long, Long, Double, Double, Double)].collect().toSet
      val batch = PaneOps.slidingDdQuantilesPane(events)
        .selectExpr("event_type", "unix_micros(win_start)", "n_vals", "q50", "q95", "q99")
        .as[(String, Long, Long, Double, Double, Double)].collect().toSet
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
      assert(batch.nonEmpty, "vacuous — no finalized windows")
    } finally q.stop()
  }
}
