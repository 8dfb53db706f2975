package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3: data generators (FileStreamDataGenerator.java:35-110,
  * KafkaStreamDataGenerator.java:30-105, BrowserStreamDataGenerator.java:
  * 30-97). The reference emits 100 randomized CSV records, one file or
  * Kafka message each; ours are seeded and therefore replayable — the
  * property the reference's generators lack that makes ours usable as
  * test fixtures (SURVEY.md §5.1).
  */
object Generators {

  val eventTypes: Seq[String] = Seq("click", "view", "purchase", "error", "signup")

  /** Deterministic event batch (seeded), mirroring the reference's value
    * domains: user pool, action pool, bounded values, monotone-ish
    * timestamps with jitter. */
  def events(seed: Long, n: Int, users: Int = 10,
      startUs: Long = 0L, stepUs: Long = 1000000L): Seq[Ev] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      Ev(
        event_id = i.toLong,
        ts = new java.sql.Timestamp((startUs + i * stepUs + r.nextInt(1000) * 1000L) / 1000L),
        user_id = 1L + r.nextInt(users),
        event_type = eventTypes(r.nextInt(eventTypes.length)),
        value = math.round(r.nextDouble() * 10000.0) / 100.0)
    }
  }

  /** CSV line in the generator's wire format (quoted fields, epoch-micros
    * timestamp) — parseable by [[StreamingPipelines.parseCsvLines]]. */
  def toCsvLine(e: Ev): String =
    s""""${e.event_id}","${e.ts.getTime * 1000L}","${e.user_id}","${e.event_type}","${e.value}""""

  /** File-stream generator: writes `files` CSV files of `perFile` records
    * each into `dir` — the batch analog of the reference's one-file-per-
    * record loop (FileStreamDataGenerator.java:58-107). A streaming file
    * source watching `dir` picks each file up as its own micro-batch. */
  def writeCsvFiles(dir: String, seed: Long, files: Int, perFile: Int): Unit = {
    val all = events(seed, files * perFile)
    Files.createDirectories(Paths.get(dir))
    all.grouped(perFile).zipWithIndex.foreach { case (group, i) =>
      Files.writeString(
        Paths.get(dir, f"events-$i%05d.csv"),
        group.map(toCsvLine).mkString("", "\n", "\n"))
    }
  }

  /** Continuous generator backed by Spark's rate source — the unbounded
    * analog (rows forever, `rowsPerSecond` throttle) for demo jobs. The
    * rate source's (timestamp, value) drives deterministic synth columns. */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int = 100): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % 10 + 1).as("user_id"),
        element_at(
          array(eventTypes.map(lit): _*),
          (col("value") % eventTypes.length + 1).cast("int")).as("event_type"),
        round((col("value") % 997) / 10.0, 2).as("value"))
}
