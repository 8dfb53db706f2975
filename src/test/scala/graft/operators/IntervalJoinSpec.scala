package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** The bucketized interval join must equal the naive range join on every
  * input — especially around the bucket boundary, where a purchase's
  * 30-minute window straddles two buckets. (No scalatest-scalacheck
  * bridge in the offline dependency set — generators sampled manually.)
  */
class IntervalJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long, Long)], idCol: String, tsCol: String): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF(idCol, "user_id", "us")
      .withColumn(tsCol, timestamp_micros(col("us"))).drop("us")
  }

  private def naive(p: DataFrame, c: DataFrame): DataFrame =
    p.join(c, p("user_id") === c("user_id")
        && c("c_ts") > p("p_ts")
        && c("c_ts") <= p("p_ts") + expr("interval 30 minutes"))
      .groupBy(p("p_id"), p("user_id"), p("p_ts"))
      .agg(count(lit(1)).as("clicks_30m"))

  private def run(ps: Seq[(Long, Long, Long)], cs: Seq[(Long, Long, Long)]): (Set[String], Set[String]) = {
    val p = df(ps, "p_id", "p_ts")
    val c = df(cs, "c_id", "c_ts").drop("c_id")
    def canon(d: DataFrame) = d.collect().map(_.mkString("|")).toSet
    (canon(EventOps.intervalJoinClicks(p, c)), canon(naive(p, c)))
  }

  private val halfHourUs = 1800L * 1000 * 1000

  test("boundary cases around the bucket edge match the naive range join") {
    // purchase 1 min before a bucket boundary; clicks inside/outside/equal
    val base = 3 * halfHourUs - 60L * 1000 * 1000
    val ps = Seq((1L, 7L, base))
    val cs = Seq(
      (10L, 7L, base - 1L),                   // before purchase: excluded
      (11L, 7L, base),                        // equal ts: excluded (strict >)
      (12L, 7L, base + 1L),                   // just after: counted
      (13L, 7L, base + halfHourUs),           // exactly +30 min: counted (<=)
      (14L, 7L, base + halfHourUs + 1L),      // past the window: excluded
      (15L, 8L, base + 5L))                   // other user: excluded
    val (got, want) = run(ps, cs)
    assert(got == want)
    assert(got.map(_.split("\\|").last) == Set("2"))
  }

  test("random event sets: bucketized == naive") {
    val genRow = for {
      id <- Gen.choose(0L, 999L)
      user <- Gen.choose(0L, 4L)
      // cluster timestamps near bucket edges to stress the straddle
      k <- Gen.choose(0L, 5L)
      o <- Gen.oneOf(Gen.choose(-3L, 3L), Gen.choose(-halfHourUs, halfHourUs))
    } yield (id, user, k * halfHourUs + o + 10 * halfHourUs)
    val genRows = Gen.listOfN(25, genRow)
    def sample[A](g: Gen[A]): A = Iterator.continually(g.sample).flatten.next()
    (1 to 10).foreach { i =>
      val ps = sample(genRows).zipWithIndex.map { case ((_, u, t), j) => (j.toLong, u, t) }
      val cs = sample(genRows)
      val (got, want) = run(ps, cs)
      assert(got == want, s"mismatch on random case $i: ps=$ps cs=$cs")
    }
  }
}
