package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkEntry, SparkSpec}

/** Streaming BPE tokenizer vs its batch dual: merges calibrated on the
  * sf0.001 documents fixture, every doc streamed through the stateless
  * application map, per-doc token counts must equal the registered
  * t_bpe_tokenize exactly. */
class BpeStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stream BPE token counts match the batch t_bpe_tokenize") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = graft.Tables.t(s, sfDir, "documents")
      .selectExpr("doc_id", "text").cache()
    val merges = StreamingPipelines.bpeMergesCalibrate(docs)
    assert(merges.length === 4, s"expected 4 calibrated merges, got $merges")

    val in = MemoryStream[(Long, String)]
    val q = StreamingPipelines
      .bpeTokenizeStream(in.toDS().toDF("doc_id", "text"), merges)
      .select("doc_id", "n_tokens")
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_stream").start()
    try {
      in.addData(docs.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()

      val stream = s.table("bpe_stream")
        .as[(Long, Long)].collect().toMap
      val batch = SparkEntry.queries("t_bpe_tokenize")(s, sfDir)
        .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap

      assert(stream.size === batch.size)
      val mismatched = batch.collect {
        case (id, n) if stream.get(id) != Some(n) => (id, n, stream.get(id))
      }
      assert(mismatched.isEmpty, s"stream/batch disagree: ${mismatched.take(5)}")
      // sanity: merges actually shrink the stream's counts below the raw
      // char count for at least one doc (the map is not a no-op)
      val chars = docs.selectExpr("doc_id",
        "cast(length(replace(text, ' ', '')) AS long) AS n").as[(Long, Long)].collect().toMap
      assert(batch.exists { case (id, n) => n < chars(id) },
        "no document ever benefited from a merge — induction is vacuous")
    } finally { q.stop(); docs.unpersist() }
  }
}
