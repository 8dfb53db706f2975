package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkEntry, SparkSpec}

/** ABTT calibrate/apply split: the streaming projector (stateless map
  * over the frozen mean + dominant-component literals) must reproduce
  * the batch e_abtt_project exactly on the calibration corpus, and must
  * project a NOVEL vector (one calibration never saw) through the same
  * formula — including the epsilon-negative residual² clamp on a vector
  * parallel to the component. */
class AbttStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming abttApply over the calibration corpus equals the batch e_abtt_project") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val model = StreamingPipelines.abttCalibrate(s, sfDir)
    assert(model.mean.length === 64 && model.component.length === 64)

    val fixture = graft.Tables.t(s, sfDir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingPipelines.abttApply(
        in.toDF().toDF("vec_id", "embedding"), model)
      .writeStream.outputMode("append")
      .format("memory").queryName("abtt_stream").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      val stream = s.table("abtt_stream")
        .selectExpr("vec_id", "proj", "resid_norm")
        .as[(Long, Double, Double)].collect().toSet
      val batch = SparkEntry.queries("e_abtt_project")(s, sfDir)
        .selectExpr("vec_id", "proj", "resid_norm")
        .as[(Long, Double, Double)].collect().toSet
      assert(batch.nonEmpty, "vacuous — batch projected nothing")
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
    } finally q.stop()
  }

  test("a novel vector projects through the frozen model, clamp engaged on a parallel vector") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val model = StreamingPipelines.abttCalibrate(s, sfDir)
    // vector 1: mean + 3*component — centered form is exactly parallel
    // to the component, so resid² = ||xc||² − proj² sits at the 6dp
    // rounding boundary and the greatest(0, ·) clamp must hold resid at
    // (near) zero instead of NaN-ing a sqrt of an epsilon-negative.
    val parallel = model.mean.zip(model.component)
      .map { case (m, c) => (m + 3.0 * c).toFloat }
    // vector 2: arbitrary novel direction
    val novel = (0 until 64).map(i => (math.sin(i * 2.17) * 0.8).toFloat)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingPipelines.abttApply(in.toDF().toDF("vec_id", "embedding"), model)
      .writeStream.outputMode("append")
      .format("memory").queryName("abtt_novel").start()
    try {
      in.addData(Seq((900L, parallel.toSeq), (901L, novel)))
      q.processAllAvailable()
      val rows = s.table("abtt_novel")
        .selectExpr("vec_id", "proj", "resid_norm")
        .as[(Long, Double, Double)].collect().sortBy(_._1)
      assert(rows.length === 2)
      val (_, pProj, pResid) = (rows(0)._1, rows(0)._2, rows(0)._3)
      // proj ≈ 3 * ||v||² ≈ 3 (component is ~unit after the 6dp pins);
      // the float cast of the input perturbs it slightly
      assert(math.abs(pProj - 3.0) < 0.01, s"parallel proj was $pProj")
      assert(pResid >= 0.0 && pResid < 0.01,
        s"parallel vector's residual should clamp to ~0, got $pResid")
      // novel vector: recompute the formula driver-side, same pins
      val xc = novel.map(_.toDouble).zip(model.mean).map { case (x, m) => x - m }
      val proj = BigDecimal(xc.zip(model.component).map { case (a, b) => a * b }.sum + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val resid = BigDecimal(math.sqrt(math.max(0.0,
          xc.map(x => x * x).sum - proj * proj)) + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(1)._2 === proj, s"novel proj ${rows(1)._2} vs recomputed $proj")
      assert(rows(1)._3 === resid, s"novel resid ${rows(1)._3} vs recomputed $resid")
    } finally q.stop()
  }
}
