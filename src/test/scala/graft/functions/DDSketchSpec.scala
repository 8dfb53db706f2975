package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.DecimalDDSketch

import graft.SparkSpec

/** The mergeable decimal-DDSketch quantile aggregate:
  * bucket/representative math, the inverted-CDF quantile rule, merge-order
  * invariance under repartitioning, SQL registration, and null/NaN
  * hygiene. The cross-engine estimates themselves are proven by the
  * q_dd_quantiles oracle row; this spec pins the Scala-side semantics.
  */
class DDSketchSpec extends SparkSpec {

  test("bucket encodes (#digits, first two digits); rep is the bucket midpoint") {
    assert(DecimalDDSketch.bucket(0.0) == 0)
    assert(DecimalDDSketch.bucket(0.7) == 0)
    assert(DecimalDDSketch.bucket(-3.2) == 0) // non-negative domain: underflow bucket
    assert(DecimalDDSketch.bucket(7.0) == 170) // mag 1, lead2 70
    assert(DecimalDDSketch.bucket(9.99) == 190)
    assert(DecimalDDSketch.bucket(10.0) == 210)
    assert(DecimalDDSketch.bucket(1234.5) == 412)
    assert(DecimalDDSketch.bucket(99999.0) == 599)
    assert(DecimalDDSketch.bucket(1e18) == DecimalDDSketch.bucket(DecimalDDSketch.MaxDomain)) // clamp
    assert(DecimalDDSketch.rep(0) == 0.5)
    assert(DecimalDDSketch.rep(412) == 1250.0) // [1200, 1300) midpoint
    assert(DecimalDDSketch.rep(210) == 10.5)   // [10, 11) midpoint
  }

  test("quantiles follow the inverted CDF on a hand-computed multiset") {
    import spark.implicits._
    // 10 values: 9 in bucket (4,12) = [1200,1300) and 1 in (4,99) = [9900,10000)
    val xs = Seq.fill(9)(1234.0) :+ 9950.0
    val r = xs.toDF("x")
      .agg(GraftFunctions.ddSketch(col("x")).as("s"))
      .select($"s.n_vals", $"s.q50", $"s.q95", $"s.q99")
      .head()
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 1250.0) // k=5 lands in the 9-count bucket
    assert(r.getDouble(2) == 9950.0) // k=ceil(9.5)=10 → the last bucket, rep (99+0.5)*100
    assert(r.getDouble(3) == 9950.0)
  }

  test("estimate is merge-order-invariant and within 5% relative error") {
    import spark.implicits._
    val xs = (1 to 10000).map(i => 900.0 + i * 3.7)
    def run(parts: Int): (Long, Double, Double, Double) = {
      val r = xs.toDF("x").repartition(parts)
        .agg(GraftFunctions.ddSketch(col("x")).as("s"))
        .select($"s.n_vals", $"s.q50", $"s.q95", $"s.q99").head()
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val a = run(1)
    val b = run(13)
    val c = run(64)
    assert(a == b && b == c, s"merge-order dependence: $a / $b / $c")
    val sorted = xs.sorted
    def exact(q: Double) = sorted(math.max(1, math.ceil(q * xs.size).toInt) - 1)
    assert(math.abs(a._2 - exact(0.50)) / exact(0.50) <= 0.05)
    assert(math.abs(a._3 - exact(0.95)) / exact(0.95) <= 0.05)
    assert(math.abs(a._4 - exact(0.99)) / exact(0.99) <= 0.05)
  }

  test("SQL registration: graft_dd_sketch aggregates from plain SQL") {
    org.apache.spark.sql.graftext.GraftExtensions.registerAll(spark)
    import spark.implicits._
    Seq((1, 100.0), (1, 200.0), (2, 50.0)).toDF("g", "x").createOrReplaceTempView("dd_in")
    val rows = spark.sql(
      "SELECT g, graft_dd_sketch(x).q50 AS q50 FROM dd_in GROUP BY g ORDER BY g").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(105.0, 50.5))
  }

  test("nulls and NaN are skipped; all-null group reports n_vals=0 with null quantiles") {
    import spark.implicits._
    val r = Seq[Option[Double]](None, Some(Double.NaN), None).toDF("x")
      .agg(GraftFunctions.ddSketch(col("x")).as("s"))
      .select($"s.n_vals", $"s.q50").head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("parameterized variant answers an arbitrary q-list from the same state") {
    import spark.implicits._
    val xs = Seq.fill(9)(1234.0) :+ 9950.0
    // qs[i] answers quantiles[i]; q=1.0 is the max bucket's rep; the
    // fixed variant's (0.50, 0.95, 0.99) reproduce exactly
    val r = xs.toDF("x")
      .agg(GraftFunctions.ddSketchQ(col("x"), Seq(0.5, 0.95, 0.99, 0.1, 1.0)).as("s"))
      .select($"s.n_vals", $"s.qs").head()
    assert(r.getLong(0) == 10L)
    assert(r.getSeq[Double](1) == Seq(1250.0, 9950.0, 9950.0, 1250.0, 9950.0))

    // merge-order invariance carries over (same histogram state)
    val big = (1 to 5000).map(i => 10.0 + i * 1.1)
    def run(parts: Int) = big.toDF("x").repartition(parts)
      .agg(GraftFunctions.ddSketchQ(col("x"), Seq(0.25, 0.999)).as("s"))
      .select($"s.qs").head().getSeq[Double](0)
    assert(run(1) == run(29))

    // SQL path with an inline array literal
    org.apache.spark.sql.graftext.GraftExtensions.registerAll(spark)
    Seq((1, 100.0), (1, 200.0)).toDF("g", "x").createOrReplaceTempView("ddq_in")
    val sql = spark.sql(
      "SELECT graft_dd_sketch_q(x, array(0.5D, 1.0D)).qs AS qs FROM ddq_in").head()
    assert(sql.getSeq[Double](0) == Seq(105.0, 205.0))
  }

  test("weighted variant: weight-1 equals unweighted; weights equal row replication") {
    val s = spark
    import s.implicits._
    val vals = Seq((12.0, 3L), (150.0, 1L), (7.0, 5L), (2000.0, 2L), (0.4, 4L))
    val df = vals.toDF("x", "w")
    // weight 1 == the plain sketch
    val w1 = df.agg(GraftFunctions.ddSketchW(col("x"), lit(1L)).as("sk"))
      .selectExpr("sk.n_weight", "sk.q50", "sk.q95", "sk.q99").head()
    val plain = df.agg(GraftFunctions.ddSketch(col("x")).as("sk"))
      .selectExpr("sk.n_vals", "sk.q50", "sk.q95", "sk.q99").head()
    assert(w1 === plain)
    // weight w == the value appearing w times
    val expanded = vals.flatMap { case (x, w) => Seq.fill(w.toInt)(x) }.toDF("x")
    val wk = df.agg(GraftFunctions.ddSketchW(col("x"), col("w")).as("sk"))
      .selectExpr("sk.n_weight", "sk.q50", "sk.q95", "sk.q99").head()
    val rep = expanded.agg(GraftFunctions.ddSketch(col("x")).as("sk"))
      .selectExpr("sk.n_vals", "sk.q50", "sk.q95", "sk.q99").head()
    assert(wk === rep)
    // null / non-positive weights contribute nothing
    val guarded = Seq((5.0, 0L), (5.0, -2L), (9.0, 2L)).toDF("x", "w")
      .agg(GraftFunctions.ddSketchW(col("x"), when(col("w") =!= -2L, col("w"))).as("sk"))
      .selectExpr("sk.n_weight").head().getLong(0)
    assert(guarded === 2L)
    // SQL registration
    org.apache.spark.sql.graftext.GraftExtensions.registerAll(s)
    df.createOrReplaceTempView("ddw_in")
    val sql = s.sql("SELECT graft_dd_sketch_w(x, w).n_weight AS n FROM ddw_in").head().getLong(0)
    assert(sql === vals.map(_._2).sum)
  }
}
