package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** W1/W4 tumbling windows + T2 watermark semantics over MemoryStream:
  * out-of-order rows within the delay are counted; rows later than the
  * watermark are dropped (their window never re-emits in append mode).
  */
class StreamingWindowSpec extends SparkSpec {

  private def ev(id: Long, sec: Long, user: Long = 1L, typ: String = "click"): Ev =
    Ev(id, new Timestamp(sec * 1000L), user, typ, 1.0)

  test("tumbling window count finalizes when the watermark passes (T2/W1/W4)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q: StreamingQuery = StreamingPipelines
      .windowCount(in.toDF(), size = "5 seconds", delay = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("win_counts").start()
    try {
      // Window [5,10): three rows, one out-of-order inside the batch.
      in.addData(ev(1, 7), ev(2, 5), ev(3, 9))
      q.processAllAvailable()
      assert(s.table("win_counts").count() === 0) // watermark still at 9-10 < window end

      // Advance event time to 30 s -> watermark 20 s -> [5,10) finalizes.
      in.addData(ev(4, 30))
      q.processAllAvailable()
      val rows = s.table("win_counts")
        .selectExpr("cast(win_start AS long)", "cnt").as[(Long, Long)].collect().toSet
      assert(rows === Set((5L, 3L)))

      // A row at 3 s is far beyond the 20 s watermark: silently dropped.
      in.addData(ev(5, 3))
      in.addData(ev(6, 50)) // push watermark far past everything open
      q.processAllAvailable()
      val all = s.table("win_counts")
        .selectExpr("cast(win_start AS long)", "cnt").as[(Long, Long)].collect().toSet
      assert(all === Set((5L, 3L), (30L, 1L))) // no [0,5) window ever appears
    } finally q.stop()
  }

  test("keyed session window merges rows within the gap (W3)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StreamingPipelines
      .sessionCount(in.toDF(), gap = "5 seconds", delay = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: rows at 0,3,6 s chain into one session (gaps < 5 s);
      // a row at 20 s starts a second session.
      in.addData(ev(1, 0), ev(2, 3), ev(3, 6), ev(4, 20))
      q.processAllAvailable()
      in.addData(ev(5, 60)) // advance watermark so both sessions close
      q.processAllAvailable()
      val rows = s.table("sessions")
        .selectExpr("user_id", "cast(session_start AS long)", "cast(session_end AS long)", "cnt")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows.contains((1L, 0L, 11L, 3L)))  // 0..6+5s gap, 3 rows merged
      assert(rows.contains((1L, 20L, 25L, 1L)))
    } finally q.stop()
  }

  test("composite-key windowed count groups by (user, action) (A4)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StreamingPipelines
      .userActionWindowCount(in.toDF(), size = "10 seconds", delay = "5 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ua_counts").start()
    try {
      in.addData(
        ev(1, 1, user = 1, typ = "click"), ev(2, 2, user = 1, typ = "click"),
        ev(3, 3, user = 1, typ = "view"), ev(4, 4, user = 2, typ = "click"))
      q.processAllAvailable()
      in.addData(ev(5, 40, user = 9))
      q.processAllAvailable()
      val rows = s.table("ua_counts")
        .selectExpr("user_id", "event_type", "cast(win_start AS long)", "cnt")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(rows.contains((1L, "click", 0L, 2L)))
      assert(rows.contains((1L, "view", 0L, 1L)))
      assert(rows.contains((2L, "click", 0L, 1L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched rows after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingPipelines
      .windowJoinOuter(clicks.toDF(), purchases.toDF(), size = "5 seconds", delay = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("outer_joined").start()
    try {
      clicks.addData(ev(1, 2, user = 1), ev(2, 3, user = 2)) // user 2 will never match
      purchases.addData(ev(10, 3, user = 1))
      q.processAllAvailable()
      // push both watermarks far past window [0,5)
      clicks.addData(ev(3, 60, user = 9))
      purchases.addData(ev(11, 60, user = 9))
      q.processAllAvailable()
      val rows = s.table("outer_joined")
        .selectExpr("event_id", "user_id", "p_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows.contains((1L, 1L, 10L)))  // matched pair
      assert(rows.contains((2L, 2L, -1L)))  // unmatched left, null right
    } finally q.stop()
  }

  test("windowed stream-stream equi join matches same user + window (J1/W5)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingPipelines
      .windowJoin(clicks.toDF(), purchases.toDF(), size = "5 seconds", delay = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("joined").start()
    try {
      clicks.addData(ev(1, 2, user = 1), ev(2, 12, user = 1))
      purchases.addData(ev(10, 3, user = 1), ev(11, 4, user = 2))
      q.processAllAvailable()
      val rows = s.table("joined")
        .selectExpr("user_id", "cast(win_start AS long)").as[(Long, Long)].collect().toSet
      // click@2 and purchase@3 share window [0,5) for user 1; click@12 and
      // user-2 purchase match nothing.
      assert(rows === Set((1L, 0L)))
    } finally q.stop()
  }
}
