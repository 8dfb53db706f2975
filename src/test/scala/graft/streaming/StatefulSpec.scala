package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** X1/X2 keyed-state semantics over MemoryStream, including the
  * reference's exact edge rules: sub-threshold double events alert
  * (StatefulOperations.java:106-115), first event emits ("None",0), and
  * Logout clears state so the NEXT event also emits ("None",0)
  * (CourseUseCase.java:143-172). State must survive across micro-batches.
  */
class StatefulSpec extends SparkSpec {

  private def ev(id: Long, sec: Long, user: Long = 1L, typ: String = "error"): Ev =
    Ev(id, new Timestamp(sec * 1000L), user, typ, 1.0)

  test("X1: two watched events within threshold alert; beyond it stay silent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StatefulOps
      .doubleEventAlerts(in.toDS(), watch = "error", thresholdUs = 10000000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("alerts").start()
    try {
      // user 1: errors 5 s apart -> alert. user 2: 20 s apart -> none.
      // Deliberately out of order inside the batch (8 before 3).
      in.addData(
        ev(2, 8, user = 1), ev(1, 3, user = 1),
        ev(3, 0, user = 2), ev(4, 20, user = 2),
        ev(5, 7, user = 3, typ = "click")) // non-watched type ignored
      q.processAllAvailable()
      val rows = s.table("alerts")
        .selectExpr("user_id", "event_id", "gap_us").as[(Long, Long, Long)].collect().toSet
      assert(rows === Set((1L, 2L, 5000000L)))

      // State survives the batch boundary: user 1's next error at 12 s is
      // 4 s after the remembered 8 s -> alerts again.
      in.addData(ev(6, 12, user = 1))
      q.processAllAvailable()
      val rows2 = s.table("alerts")
        .selectExpr("user_id", "event_id", "gap_us").as[(Long, Long, Long)].collect().toSet
      assert(rows2 === Set((1L, 2L, 5000000L), (1L, 6L, 4000000L)))
    } finally q.stop()
  }

  test("X2: first event and post-clear event emit (None,0); others emit prev action + duration") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StatefulOps
      .sessionizeActions(in.toDS(), clearOn = "logout")
      .writeStream.outputMode("append")
      .format("memory").queryName("durations").start()
    try {
      in.addData(
        ev(1, 0, typ = "login"),
        ev(2, 4, typ = "view"),
        ev(3, 9, typ = "logout"))
      q.processAllAvailable()
      // Second batch: state was cleared by logout -> 4 emits (None,0).
      in.addData(ev(4, 15, typ = "login"), ev(5, 21, typ = "view"))
      q.processAllAvailable()
      val rows = s.table("durations")
        .selectExpr("event_id", "prev_action", "duration_us").as[(Long, String, Long)]
        .collect().toSet
      assert(rows === Set(
        (1L, "None", 0L),          // first event ever
        (2L, "login", 4000000L),   // 4 s after login
        (3L, "view", 5000000L),    // logout itself reports the view duration
        (4L, "None", 0L),          // state cleared by logout
        (5L, "login", 6000000L)))
    } finally q.stop()
  }

  test("X1: a cross-batch late event neither alerts with a negative gap nor regresses state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StatefulOps
      .doubleEventAlerts(in.toDS(), watch = "error", thresholdUs = 10000000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("alerts_late").start()
    try {
      in.addData(ev(1, 100))
      q.processAllAvailable()
      in.addData(ev(2, 5)) // 95 s OLDER than stored state
      q.processAllAvailable()
      in.addData(ev(3, 104)) // 4 s after the true last event at 100 s
      q.processAllAvailable()
      val rows = s.table("alerts_late")
        .selectExpr("event_id", "gap_us").as[(Long, Long)].collect().toSet
      // no alert for the late event (would have been gap_us = -95e6), and
      // state stayed at 100 s so event 3 alerts with the true 4 s gap
      assert(rows === Set((3L, 4000000L)))
    } finally q.stop()
  }

  test("X2: a cross-batch late event is excluded instead of emitting a negative duration") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StatefulOps
      .sessionizeActions(in.toDS(), clearOn = "logout")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_late").start()
    try {
      in.addData(ev(1, 50, typ = "view"))
      q.processAllAvailable()
      in.addData(ev(2, 10, typ = "click")) // older than the open slot
      q.processAllAvailable()
      in.addData(ev(3, 51, typ = "view"))
      q.processAllAvailable()
      val rows = s.table("sessions_late")
        .selectExpr("event_id", "prev_action", "duration_us")
        .as[(Long, String, Long)].collect().toSet
      // event 2 emitted nothing; event 3 measures from the UNREGRESSED view@50s
      assert(rows === Set((1L, "None", 0L), (3L, "view", 1000000L)))
    } finally q.stop()
  }
}
