package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkEntry, SparkSpec}

/** Streaming perplexity-band filter vs its batch dual: calibrated on
  * the sf0.001 documents fixture, the stream must route exactly the
  * docs the batch `d_perplexity_band` keeps (same model, same cuts,
  * same 4 dp score pin — the only difference is fold order inside one
  * doc's bigram array, which the pin absorbs).
  */
class PerplexityBandStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stream band membership matches the batch d_perplexity_band") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = graft.Tables.t(s, sfDir, "documents")
      .selectExpr("doc_id", "text").cache()
    val (model, lo, hi) = StreamingPipelines.perplexityBandCalibrate(docs)
    assert(lo <= hi)

    val in = MemoryStream[(Long, String)]
    val (inBand, outBand) = StreamingPipelines.perplexityBand(
      in.toDS().toDF("doc_id", "text"), model, lo, hi)
    val q1 = inBand.writeStream.outputMode("append")
      .format("memory").queryName("ppl_in").start()
    val q2 = outBand.writeStream.outputMode("append")
      .format("memory").queryName("ppl_out").start()
    try {
      in.addData(docs.as[(Long, String)].collect().toSeq)
      q1.processAllAvailable(); q2.processAllAvailable()

      val streamKept = s.table("ppl_in").select("doc_id").as[Long].collect().toSet
      val streamDropped = s.table("ppl_out").select("doc_id").as[Long].collect().toSet
      val batchKept = SparkEntry.queries("d_perplexity_band")(s, sfDir)
        .select("doc_id").as[Long].collect().toSet

      assert(streamKept === batchKept,
        s"stream/batch band disagree: only-stream=${(streamKept -- batchKept).take(5)} " +
          s"only-batch=${(batchKept -- streamKept).take(5)}")
      // routing is a partition: every doc goes exactly one way
      assert((streamKept ++ streamDropped).size === docs.count())
      assert(streamKept.intersect(streamDropped).isEmpty)
    } finally { q1.stop(); q2.stop(); docs.unpersist() }
  }

  test("length-prefixed model keys: adversarial token boundaries cannot alias") {
    val s = spark
    import s.implicits._
    // ("ab","c") and ("a","bc") concatenate to the same bytes "abc"; the
    // len(w1) prefix keeps them distinct model entries with their own
    // P(w2|w1) — an unprefixed joiner (or any in-token separator char)
    // would fuse their counts
    val calib = Seq((1L, "ab c"), (2L, "a bc"), (3L, "a xx"))
      .toDF("doc_id", "text")
    val (model, _, _) = StreamingPipelines.perplexityBandCalibrate(calib)
    assert(model.keySet === Set("2:abc", "1:abc", "1:axx"))
    assert(model("2:abc") === 1.0, "P(c|ab) over 1 occurrence of w1=ab")
    assert(model("1:abc") === 0.5, "P(bc|a) over 2 occurrences of w1=a")
    assert(model("1:axx") === 0.5, "P(xx|a) over 2 occurrences of w1=a")
  }

  test("unscorable and unseen docs route out-of-band") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (model, lo, hi) = StreamingPipelines.perplexityBandCalibrate(
      Seq((1L, "x y x y x z")).toDF("doc_id", "text"))
    val in = MemoryStream[(Long, String)]
    val (inBand, outBand) = StreamingPipelines.perplexityBand(
      in.toDS().toDF("doc_id", "text"), model, lo, hi)
    val q1 = inBand.writeStream.outputMode("append")
      .format("memory").queryName("ppl_in2").start()
    val q2 = outBand.writeStream.outputMode("append")
      .format("memory").queryName("ppl_out2").start()
    try {
      in.addData((10L, "single"), (11L, "totally unseen words here"))
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(s.table("ppl_in2").isEmpty)
      val out = s.table("ppl_out2").selectExpr("doc_id", "lm_score")
        .as[(Long, Option[Double])].collect().toMap
      assert(out.keySet === Set(10L, 11L))
      assert(out(10L).isEmpty)        // <2 tokens: unscorable, null score
      assert(out(11L).contains(0.0))  // all-unseen bigrams: scores 0
    } finally { q1.stop(); q2.stop() }
  }
}
