package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming decontamination: documents sharing any 13-token n-gram with
  * the broadcast eval gram set route to the contaminated side; clean and
  * short documents pass. The gram domain is the SAME expression the
  * batch `d_decontaminate` query uses, so stream and batch agree
  * bit-for-bit on what counts as contaminated.
  */
class DecontaminateStreamSpec extends SparkSpec {

  private def doc(id: Long, text: String): CurateDoc =
    CurateDoc(id, new Timestamp(id * 1000L), text, "en")

  private val evalText = (1 to 20).map(i => s"eval$i").mkString(" ")

  test("stream routes 13-gram overlaps against the eval set; batch filter agrees") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evalDocs = Seq(doc(900, evalText)).toDF()
    val grams = StreamingPipelines.evalGramSet(evalDocs)
    assert(grams.length === 20 - 12) // 8 distinct 13-grams in a 20-token doc

    val in = MemoryStream[CurateDoc]
    val (clean, dirty) = StreamingPipelines.decontaminate(in.toDF(), grams)
    val qc = clean.writeStream.outputMode("append").format("memory").queryName("dc_clean").start()
    val qd = dirty.writeStream.outputMode("append").format("memory").queryName("dc_dirty").start()
    try {
      in.addData(
        doc(1, (1 to 30).map(i => s"tok$i").mkString(" ")),   // clean
        doc(2, "prefix " + evalText + " suffix"),             // contains eval 13-grams
        doc(3, evalText.split(" ").take(12).mkString(" ")),   // 12 tokens: too short to carry a gram
        doc(4, (1 to 12).map(i => s"eval$i").mkString(" ") + " tok"))  // shares 12 eval tokens but no full 13-gram
      qc.processAllAvailable(); qd.processAllAvailable()
      val cleanIds = s.table("dc_clean").select("doc_id").as[Long].collect().toSet
      val dirtyIds = s.table("dc_dirty").select("doc_id").as[Long].collect().toSet
      assert(dirtyIds === Set(2L))
      assert(cleanIds === Set(1L, 3L, 4L))
      // routed output keeps the input schema untouched
      assert(s.table("dc_clean").columns.toSeq === evalDocs.columns.toSeq)
    } finally { qc.stop(); qd.stop() }

    // batch/stream parity: the same helper applied to a static frame
    val static = Seq(doc(1, "x " + evalText), doc(2, "unrelated words only")).toDF()
    val (bClean, bDirty) = StreamingPipelines.decontaminate(static, grams)
    assert(bDirty.select("doc_id").as[Long].collect().toSet === Set(1L))
    assert(bClean.select("doc_id").as[Long].collect().toSet === Set(2L))

    // empty eval set: nothing can be contaminated, everything routes clean
    val (allClean, none) = StreamingPipelines.decontaminate(static, Array.empty[Long])
    assert(none.isEmpty && allClean.count() === 2)
    // an eval corpus of only short docs produces no grams at all
    assert(StreamingPipelines.evalGramSet(
      Seq(doc(901, "too short")).toDF()).isEmpty)
  }
}
