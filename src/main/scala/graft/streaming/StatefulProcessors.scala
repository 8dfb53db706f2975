package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** X1/X2 on Spark 4's `transformWithState` — the modern arbitrary-state
  * API and the closest analog of Flink's keyed `ValueState` (the
  * reference holds exactly one value slot per key,
  * StatefulOperations.java:87-126, CourseUseCase.java:120-176). State
  * lives in per-key `ValueState` handles backed by the RocksDB state
  * store; [[StatefulOps]] keeps the `flatMapGroupsWithState` versions for
  * the HDFS-backed store.
  */
object StatefulProcessors {

  /** X1: remember last watched-event timestamp per user; alert when two
    * arrive within the threshold. */
  final class DoubleEventProcessor(watch: String, thresholdUs: Long)
      extends StatefulProcessor[Long, Ev, Alert] {

    @transient private var lastTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastTs = getHandle.getValueState[Long]("lastTs", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Alert] = {
      val out = Seq.newBuilder[Alert]
      rows.toSeq.filter(_.event_type == watch)
        .sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val tUs = e.ts.getTime * 1000L
          if (lastTs.exists() && tUs - lastTs.get() < thresholdUs)
            out += Alert(user, e.event_id, e.ts, tUs - lastTs.get())
          lastTs.update(tUs)
        }
      out.result().iterator
    }
  }

  /** X2: two-slot sessionizer; `clearOn` wipes the slot (Logout rule). */
  final class SessionizeProcessor(clearOn: String)
      extends StatefulProcessor[Long, Ev, ActionDuration] {

    @transient private var slot: ValueState[(String, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      slot = getHandle.getValueState[(String, Long)](
        "slot", Encoders.tuple(Encoders.STRING, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[ActionDuration] = {
      val out = Seq.newBuilder[ActionDuration]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val tUs = e.ts.getTime * 1000L
        if (slot.exists()) {
          val (action, startUs) = slot.get()
          out += ActionDuration(user, e.event_id, action, tUs - startUs)
        } else {
          out += ActionDuration(user, e.event_id, "None", 0L)
        }
        if (e.event_type == clearOn) slot.clear() else slot.update((e.event_type, tUs))
      }
      out.result().iterator
    }
  }

  private implicit val evEnc = Encoders.product[Ev]
  private implicit val alertEnc = Encoders.product[Alert]
  private implicit val adEnc = Encoders.product[ActionDuration]
  private implicit val longEnc = Encoders.scalaLong

  def doubleEventAlerts(events: Dataset[Ev], watch: String = "error",
      thresholdUs: Long = 10000000L): Dataset[Alert] =
    events.groupByKey(_.user_id)
      .transformWithState(new DoubleEventProcessor(watch, thresholdUs),
        TimeMode.None(), OutputMode.Append())

  def sessionizeActions(events: Dataset[Ev], clearOn: String = "error"): Dataset[ActionDuration] =
    events.groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(clearOn),
        TimeMode.None(), OutputMode.Append())
}
