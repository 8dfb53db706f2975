package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Job 9, the streaming corpus capstone: curate -> decontaminate -> pack
  * end to end over a monitored JSON directory, with contaminated docs
  * quarantined and clean docs packed into token-budget bins.
  */
class CorpusPipelineSpec extends SparkSpec {

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def jline(id: Long, sec: Long, text: String): String =
    s"""{"doc_id":$id,"ts_s":$sec,"text":"$text","lang":"en"}"""

  test("job 9: curated clean docs are packed; contaminated docs quarantined") {
    withRocksDb {
    val s = spark
    import s.implicits._
    val d = Jobs.Dirs(
      Files.createTempDirectory("corpus-in").toString,
      Files.createTempDirectory("corpus-out").toString,
      Files.createTempDirectory("corpus-ck").toString)

    val evalText = (1 to 20).map(i => s"eval$i").mkString(" ")
    val grams = StreamingPipelines.evalGramSet(
      Seq((900L, evalText)).toDF("doc_id", "text"))

    val good1 = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val good2 = (1 to 40).map(i => s"beta$i").mkString(" ")
    val junk = Seq.fill(40)("the a").mkString(" ") // fails quality gate
    val dirty = "prefix " + evalText + " " + (1 to 20).map(i => s"pad$i").mkString(" ")

    Files.writeString(Paths.get(d.in, "b1.json"),
      Seq(
        jline(1, 10, good1),
        jline(2, 11, junk),
        jline(3, 12, dirty),
        jline(4, 13, good1.toUpperCase), // normalized duplicate of 1
        jline(5, 14, good2)).mkString("", "\n", "\n"))

    val (qPacked, qQuarantine) = Jobs.corpusPipeline(s, d, grams)
    try {
      qPacked.processAllAvailable(); qQuarantine.processAllAvailable()
    } finally { qPacked.stop(); qQuarantine.stop() }

    val packedIds = s.read.parquet(s"${d.out}/packed")
      .select("doc_id").as[Long].collect().toSet
    assert(packedIds === Set(1L, 5L)) // junk gated, dirty routed, dup dropped
    val packed = s.read.parquet(s"${d.out}/packed")
      .selectExpr("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(packed(1L) === 40L && packed(5L) === 40L)
    val quarantined = s.read.parquet(s"${d.out}/contaminated")
      .select("doc_id").as[Long].collect().toSet
    assert(quarantined === Set(3L))
    }
  }
}
