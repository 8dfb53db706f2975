package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming corpus curation: the quality gate drops junk, the digest
  * dedup drops exact near-duplicates (case/whitespace-normalized) within
  * the watermark, and distinct documents pass.
  */
// Top-level so Catalyst codegen can construct it — an inner case class
// needs the enclosing suite instance and silently falls back to
// interpreted projections.
case class CurateDoc(doc_id: Long, ts: Timestamp, text: String, lang: String)

class CurateStreamSpec extends SparkSpec {

  private def doc(id: Long, sec: Long, text: String): CurateDoc =
    CurateDoc(id, new Timestamp(sec * 1000L), text, "en")

  // diverse words, long enough to clear the quality score at 0.62
  private val good =
    (1 to 40).map(i => s"token$i").mkString(" ")
  private val junk =
    Seq.fill(40)("the a").mkString(" ") // stopword soup, low diversity

  test("quality gate + digest dedup over a document stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[CurateDoc]
    val q = StreamingPipelines.curateDocs(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    try {
      in.addData(
        doc(1, 10, good),
        doc(3, 12, junk),                     // fails the quality gate
        doc(4, 13, good + " extra"))          // distinct: passes
      q.processAllAvailable()
      // second batch: normalized duplicate of 1 — dropped by digest state
      in.addData(doc(2, 11, good.toUpperCase + "  "))
      q.processAllAvailable()
      val ids = s.table("curated").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 4L))
    } finally q.stop()
  }
}
