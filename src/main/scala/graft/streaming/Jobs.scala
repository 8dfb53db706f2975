package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** The reference's seven streaming jobs (SURVEY.md §0 file inventory),
  * wired end-to-end: source -> transform -> sink with checkpointing.
  * Each returns the started [[StreamingQuery]]; callers own lifecycle.
  * `dirs.in` is the monitored input directory ([[Generators.writeCsvFiles]]
  * feeds it); `dirs.out`/`dirs.ckpt` receive sink output and checkpoints.
  */
object Jobs {

  final case class Dirs(in: String, out: String, ckpt: String)

  private def src(spark: SparkSession, d: Dirs) =
    StreamingPipelines.textFileSource(spark, d.in)

  /** Job 1 (BasicStreamingOperations.java): file source -> parse ->
    * 5 s tumbling count -> file sink. */
  def basicStreaming(spark: SparkSession, d: Dirs): StreamingQuery =
    Sinks.file(StreamingPipelines.windowCount(src(spark, d)), d.out, d.ckpt)

  /** Job 2 (KeyedStreamOperations.java): keyed running reduce -> console. */
  def keyedStream(spark: SparkSession, d: Dirs): StreamingQuery =
    Sinks.console(StreamingPipelines.runningSum(src(spark, d)), OutputMode.Update, d.ckpt)

  /** Job 3 (StreamSplitAndCombine.java): split by type, tag, re-merge. */
  def splitAndCombine(spark: SparkSession, d: Dirs): StreamingQuery = {
    val events = src(spark, d)
    val merged = StreamingPipelines.tagAndMerge(
      StreamingPipelines.splitMain(events),
      events.filter(org.apache.spark.sql.functions.col("event_type") === "view"))
    Sinks.file(merged, d.out, d.ckpt)
  }

  /** Job 4 (WindowingOperations.java): sliding + session windows — two
    * branches off one source, two queries. */
  def windowing(spark: SparkSession, d: Dirs): (StreamingQuery, StreamingQuery) = {
    val events = src(spark, d)
    val sliding = Sinks.file(
      StreamingPipelines.slidingCount(events), s"${d.out}/sliding", s"${d.ckpt}/sliding")
    val session = Sinks.file(
      StreamingPipelines.sessionCount(events), s"${d.out}/session", s"${d.ckpt}/session")
    (sliding, session)
  }

  /** Job 5 (WindowJoins.java): windowed join of two file streams. */
  def windowJoins(spark: SparkSession, clicksDir: String, purchasesDir: String,
      out: String, ckpt: String): StreamingQuery =
    Sinks.file(
      StreamingPipelines.windowJoin(
        StreamingPipelines.textFileSource(spark, clicksDir),
        StreamingPipelines.textFileSource(spark, purchasesDir)),
      out, ckpt)

  /** Job 6 (EventTimeOperations.java): watermarked event-time window with
    * late-data capture (T4) feeding the on-time branch to a file sink. */
  def eventTime(spark: SparkSession, d: Dirs): StreamingQuery = {
    val router = new LateDataRouter(
      delayUs = 10000000L,
      onTime = b => if (!b.isEmpty) b.write.mode("append").parquet(s"${d.out}/ontime"),
      late = b => if (!b.isEmpty) b.write.mode("append").parquet(s"${d.out}/late"))
    router.start(src(spark, d), d.ckpt)
  }

  /** Job 7 (StatefulOperations.java): double-event alerts -> console. */
  def stateful(spark: SparkSession, d: Dirs): StreamingQuery = {
    import spark.implicits._
    Sinks.console(
      StatefulOps.doubleEventAlerts(src(spark, d).as[Ev]).toDF(),
      OutputMode.Append, d.ckpt)
  }

  /** Job 8 (CourseUseCase.java, capstone): per-(user,action) window counts
    * + sessionized action durations — two queries off one source. */
  def courseUseCase(spark: SparkSession, d: Dirs): (StreamingQuery, StreamingQuery) = {
    import spark.implicits._
    val events = src(spark, d)
    val counts = Sinks.file(
      StreamingPipelines.userActionWindowCount(events),
      s"${d.out}/counts", s"${d.ckpt}/counts")
    val durations = Sinks.file(
      StatefulOps.sessionizeActions(events.as[Ev], clearOn = "error").toDF(),
      s"${d.out}/durations", s"${d.ckpt}/durations")
    (counts, durations)
  }
}
