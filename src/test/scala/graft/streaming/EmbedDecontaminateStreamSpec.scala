package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkEntry, SparkSpec}

/** Semantic-decontamination calibrate/apply split: the streaming scorer
  * (stateless map over the frozen broadcast eval model) must reproduce
  * the batch d_embed_decontaminate exactly on the calibration corpus,
  * and a NOVEL document must score through the same frozen model — an
  * exact eval-vector copy quarantines at cos 1.0 with the right eval
  * id, an orthogonal vector stays clean. */
class EmbedDecontaminateStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private type Row5 = (Long, String, Long, Double, Boolean)

  test("streaming embedDecontaminate over the calibration corpus equals the batch query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val eval = graft.operators.EmbeddingOps.embedEvalModel(s, sfDir)
    assert(eval.nonEmpty, "vacuous — fixture has no eval vectors")

    // the batch query's corpus side, replayed as arriving documents
    val fixture = graft.Tables.t(s, sfDir, "documents")
      .join(graft.Tables.t(s, sfDir, "embeddings"),
        $"doc_id" === $"vec_id" && $"vec_id" >= 10)
      .select($"doc_id", $"source", $"embedding")
      .as[(Long, String, Seq[Float])].collect().toSeq
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = StreamingPipelines.embedDecontaminate(
        in.toDF().toDF("doc_id", "source", "embedding"), eval)
      .writeStream.outputMode("append")
      .format("memory").queryName("embed_decon").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      val stream = s.table("embed_decon")
        .selectExpr("doc_id", "source", "top_eval", "top_cos", "quarantined")
        .as[Row5].collect().toSet
      val batch = SparkEntry.queries("d_embed_decontaminate")(s, sfDir)
        .selectExpr("doc_id", "source", "top_eval", "top_cos", "quarantined")
        .as[Row5].collect().toSet
      assert(batch.nonEmpty, "vacuous — batch scored nothing")
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
    } finally q.stop()
  }

  test("novel arrivals score through the frozen model: eval copies quarantine at cos 1, orthogonal vectors stay clean") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val eval = graft.operators.EmbeddingOps.embedEvalModel(s, sfDir)
    assert(eval.nonEmpty)
    val copyOf = eval.head // a paraphrase so good it IS the benchmark row
    val copy = (900001L, "web", copyOf.ed.map(_.toFloat))
    // orthogonal-ish: a one-hot axis vector is orthogonal to a random
    // dense eval vector up to its single matching coordinate
    val oneHot = (900002L, "web",
      (0 until 64).map(i => if (i == 0) 1.0f else 0.0f))
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = StreamingPipelines.embedDecontaminate(
        in.toDF().toDF("doc_id", "source", "embedding"), eval)
      .writeStream.outputMode("append")
      .format("memory").queryName("embed_decon_novel").start()
    try {
      in.addData(Seq(copy, oneHot))
      q.processAllAvailable()
      val rows = s.table("embed_decon_novel")
        .selectExpr("doc_id", "top_eval", "top_cos", "quarantined")
        .as[(Long, Long, Double, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      val hit = rows(900001L)
      assert(hit._2 === copyOf.id && hit._3 > 0.999 && hit._4,
        s"an exact eval copy must quarantine against its own eval id: $hit")
      val miss = rows(900002L)
      assert(!miss._4 && miss._3 < 0.4,
        s"a near-orthogonal vector must stay clean: $miss")
    } finally q.stop()
  }

  test("an empty eval model is refused with a clear message, not a plan-time greatest() error (ADVICE r17)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String, Seq[Float])]
    val e = intercept[IllegalArgumentException] {
      StreamingPipelines.embedDecontaminate(
        in.toDF().toDF("doc_id", "source", "embedding"), Seq.empty)
    }
    assert(e.getMessage.contains("non-empty eval model"), e.getMessage)
  }
}
