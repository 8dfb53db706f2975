package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** P1 parse, M1 split, M2 merge, A2 running sum — the row-transform and
  * split/merge operators, exercised through both the unified batch path
  * and a streaming update-mode query.
  */
class PipelineOpsSpec extends SparkSpec {

  private def ev(id: Long, sec: Long, user: Long, typ: String, v: Double): Ev =
    Ev(id, new Timestamp(sec * 1000L), user, typ, v)

  test("P1: CSV line parse strips quotes and casts positionally") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      "\"7\",\"5000000\",\"3\",\"click\",\"2.5\"",
      "9,11000000,4,purchase,1.0").toDF("value")
    val parsed = StreamingPipelines.parseCsvLines(lines)
      .selectExpr("event_id", "cast(ts AS long)", "user_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect().toSet
    assert(parsed === Set(
      (7L, 5L, 3L, "click", 2.5),
      (9L, 11L, 4L, "purchase", 1.0)))
  }

  test("M1/M2: split is a disjoint partition; merge tags both sides") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ev(1, 1, 1, "purchase", 1.0), ev(2, 2, 1, "view", 1.0), ev(3, 3, 2, "click", 1.0)).toDF()
    val main = StreamingPipelines.splitMain(df)
    val side = StreamingPipelines.splitSide(df)
    assert(main.select("event_id").as[Long].collect().toSet === Set(1L))
    assert(side.select("event_id").as[Long].collect().toSet === Set(2L, 3L))
    assert(main.count() + side.count() === df.count())

    val merged = StreamingPipelines.tagAndMerge(main, df.filter($"event_type" === "view"))
      .selectExpr("src", "event_id").as[(String, Long)].collect().toSet
    assert(merged === Set(("Stream-1", 1L), ("Stream-2", 2L)))
  }

  test("P1 quarantine: malformed lines route to the bad side intact") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      "\"1\",\"5000000\",\"3\",\"click\",\"2.5\"", // good
      "garbage line",                             // wrong arity
      "\"x\",\"5000000\",\"3\",\"click\",\"2.5\"", // unparseable id
      "\"2\",\"6000000\",\"4\",\"view\",\"1.0\"").toDF("value")
    val (good, bad) = StreamingPipelines.parseCsvQuarantine(lines)
    assert(good.select("event_id").as[Long].collect().toSet === Set(1L, 2L))
    assert(bad.as[String].collect().toSet ===
      Set("garbage line", "\"x\",\"5000000\",\"3\",\"click\",\"2.5\""))
  }

  test("observed metrics report rows and sums without a second scan") {
    val s = spark
    import s.implicits._
    val df = StreamingPipelines.withObservedMetrics(
      Seq(ev(1, 1, 1, "click", 2.0), ev(2, 2, 1, "view", 3.5)).toDF())
    df.collect()
    val m = df.queryExecution.observedMetrics("graft_metrics")
    assert(m.getAs[Long]("rows") === 2L)
    assert(m.getAs[Long]("null_users") === 0L)
    assert(m.getAs[Double]("value_sum") === 5.5)
  }

  test("stream-static enrichment join decorates each micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[Ev]
    val q = StreamingPipelines.staticEnrich(in.toDF(), dim, Seq("user_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try {
      in.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 2, "view", 1.0), ev(3, 3, 9, "click", 1.0))
      q.processAllAvailable()
      val rows = s.table("enriched").selectExpr("event_id", "tier")
        .as[(Long, String)].collect().toSet
      // user 9 has no dimension row -> inner join drops it
      assert(rows === Set((1L, "gold"), (2L, "silver")))
    } finally q.stop()
  }

  test("A2: keyed running sum emits updated totals per micro-batch (update mode)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StreamingPipelines.runningSum(in.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("running").start()
    try {
      in.addData(ev(1, 1, 1, "click", 2.0), ev(2, 2, 1, "click", 3.0))
      q.processAllAvailable()
      in.addData(ev(3, 3, 1, "click", 5.0), ev(4, 4, 2, "click", 7.0))
      q.processAllAvailable()
      // memory sink in update mode appends each emission; the LAST row per
      // user is the current running total — exactly the reference's
      // per-record emission cadence, batched (KeyedStreamOperations.java:62-68).
      val latest = s.table("running").as[(Long, Double)].collect()
        .zipWithIndex.groupBy(_._1._1).map { case (u, rows) => u -> rows.maxBy(_._2)._1._2 }
      assert(latest === Map(1L -> 10.0, 2L -> 7.0))
    } finally q.stop()
  }
}
