package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must be reachable from plain SQL via
  * SparkSessionExtensions, and must agree with their reference semantics
  * on literal inputs (cross-engine agreement is covered by the DuckDB
  * oracle gate; these pin the kernels directly).
  */
class GraftFunctionsSpec extends AnyFunSuite {

  // The extensions config only applies at session build time and the test
  // JVM shares one session, so register through the same builder triples
  // the extensions class injects.
  private lazy val spark: SparkSession = {
    val s = graft.SparkSpec.session
    org.apache.spark.sql.graftext.GraftExtensions.registerAll(s)
    s
  }

  test("graft functions are callable from SQL via SparkSessionExtensions") {
    val row = spark.sql(
      """SELECT graft_simhash32(split('a b c d', ' ')) AS sh,
                graft_minhash_sig(split('a b c d e', ' ')) AS mh,
                graft_trigram_hashes(split('a b c d', ' ')) AS th,
                graft_sorted_intersect_count(array(1L, 3L, 7L), array(3L, 5L, 7L, 9L)) AS ic""")
      .head()
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[scala.collection.Seq[Long]]("mh").length === 16)
    assert(row.getAs[scala.collection.Seq[Long]]("th").length === 2) // 'a b c' and 'b c d'
    assert(row.getAs[Int]("ic") === 2)              // {3, 7}
  }

  test("vector kernels are callable from SQL and wrong arity is a clear error") {
    val row = spark.sql(
      """SELECT graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_vec_l2sq(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS l""").head()
    assert(row.getAs[Double]("d") === 11.0)
    assert(row.getAs[Double]("l") === 8.0)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_vec_dot(array(1.0d))").head()
    }
    assert(err.getMessage.contains("expects 2 argument"))
  }

  test("self-intersect fold keeps null-propagating semantics under legacy sizeOfNull") {
    val key = "spark.sql.legacy.sizeOfNull"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      // unoptimized intersect of a null array is null; the Size() rewrite
      // must not turn it into -1 under the legacy conf
      val r = spark.sql(
        "SELECT graft_sorted_intersect_count(cast(null AS array<bigint>), cast(null AS array<bigint>)) AS c").head()
      assert(r.isNullAt(0))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("minhash signature is permutation-consistent and order-sensitive") {
    val df = spark.sql(
      """SELECT graft_minhash_sig(split('x y z x y z', ' ')) AS a,
                graft_minhash_sig(split('x y z x y z x y z', ' ')) AS b,
                graft_minhash_sig(split('z y x z y x', ' ')) AS c""").head()
    val a = df.getAs[scala.collection.Seq[Long]]("a")
    // one more repetition adds only duplicate shingles ({xyz,yzx,zxy}
    // either way) and min is dedup-invariant -> identical signature
    assert(a === df.getAs[scala.collection.Seq[Long]]("b"))
    // reversed token order produces different shingles -> different sig
    assert(a !== df.getAs[scala.collection.Seq[Long]]("c"))
  }

  test("optimizer rule folds self-intersection to size(x)") {
    val s = spark
    // the rule is injected via extensions at build time; apply it directly
    // here since the shared test session predates registration
    val df = s.sql(
      "SELECT graft_sorted_intersect_count(v, v) AS n FROM (SELECT array(1L, 2L, 3L) AS v)")
    val optimized = org.apache.spark.sql.graftext.SimplifySelfIntersect(
      df.queryExecution.analyzed)
    assert(!optimized.toString.contains("graft_sorted_intersect_count"),
      s"rule did not fire:\n$optimized")
    assert(optimized.toString.contains("size("))
    // and the rewrite is semantics-preserving
    assert(df.head().getInt(0) === 3)
  }

  test("sorted intersect handles empty and disjoint arrays") {
    val r = spark.sql(
      """SELECT graft_sorted_intersect_count(array(1L, 2L), array(3L, 4L)) AS d,
                graft_sorted_intersect_count(cast(array() AS array<bigint>), array(1L)) AS e""").head()
    assert(r.getAs[Int]("d") === 0)
    assert(r.getAs[Int]("e") === 0)
  }

  test("md5Hash48 equals the conv(substring(md5)) composition") {
    val s = spark
    val df = s.sql(
      """SELECT v,
           cast(conv(substring(md5(v), 1, 12), 16, 10) AS bigint) AS via_conv
         FROM (SELECT cast(id * 7919 AS string) AS v FROM range(500))""")
      .withColumn("via_native", graft.functions.GraftFunctions.md5Hash48(
        org.apache.spark.sql.functions.col("v")))
    assert(df.filter("via_conv <> via_native").isEmpty)
  }

  test("signPack matches the HOF fold it replaced, on both halves") {
    val s = spark
    import org.apache.spark.sql.functions._
    // signed doubles with exact zeros sprinkled in (zero is NOT > 0, so
    // the bit must stay clear — the boundary the pack must not flip)
    val df = s.sql(
      """SELECT transform(sequence(0, 63),
                  i -> CASE WHEN (i * 37 + id * 11) % 5 = 0 THEN 0.0d
                            ELSE sin(cast(i * 131 + id * 17 AS double)) END) AS ed
         FROM range(300)""")
    def half(off: Int) =
      s"aggregate(sequence(0, 31), cast(0 AS bigint), (acc, j) -> acc + " +
        s"IF(element_at(ed, j + $off) > 0D, shiftleft(cast(1 AS bigint), j), cast(0 AS bigint)))"
    val both = df
      .withColumn("lo_hof", expr(half(1)))
      .withColumn("hi_hof", expr(half(33)))
      .withColumn("lo_k", graft.functions.GraftFunctions.signPack(col("ed"), 0))
      .withColumn("hi_k", graft.functions.GraftFunctions.signPack(col("ed"), 32))
    assert(both.filter("lo_hof <> lo_k OR hi_hof <> hi_k").isEmpty)
    // SQL registration with a literal off; non-literal off is a loud error
    val r = s.sql(
      "SELECT graft_sign_pack(array_repeat(1.0d, 64), 0) AS lo, " +
        "graft_sign_pack(array_repeat(-1.0d, 64), 32) AS hi").head()
    assert(r.getAs[Long]("lo") === 0xFFFFFFFFL && r.getAs[Long]("hi") === 0L)
  }

  test("ngramHashes matches the md5 15-hex SQL domain and generalizes trigramHashes") {
    val s = spark
    import org.apache.spark.sql.functions._
    // synthetic token arrays of varying width around the n=13 boundary
    val df = s.sql(
      """SELECT transform(sequence(1, cast(10 + id % 8 AS int)),
                          i -> concat('w', cast((i * 31 + id) % 17 AS string))) AS toks
         FROM range(200)""")
    val viaSql = df.selectExpr(
      """CASE WHEN size(toks) >= 13 THEN
           array_sort(array_distinct(transform(sequence(0, size(toks) - 13),
             i -> cast(conv(substring(md5(array_join(slice(toks, i + 1, 13), '')), 1, 15), 16, 10) AS bigint))))
         ELSE cast(array() AS array<bigint>) END AS g""")
    val viaNative = df.select(
      graft.functions.GraftFunctions.ngramHashes(col("toks"), 13).as("g"))
    assert(viaSql.exceptAll(viaNative).isEmpty && viaNative.exceptAll(viaSql).isEmpty)
    // n=3 reproduces the trigram kernel exactly
    val tri = df.select(
      graft.functions.GraftFunctions.trigramHashes(col("toks")).as("a"),
      graft.functions.GraftFunctions.ngramHashes(col("toks"), 3).as("b"))
    assert(tri.filter("a <> b").isEmpty)
  }

  test("graft_media_ahash equals the SQL-HOF aHash it replaced, per half") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a", "zz", "the " * 40 + "end",
      "MIXED case With   spaces collapsed already? no — raw here",
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString).toDF("s")
    val both = docs
      .selectExpr("s", "length(s) AS len",
        "transform(sequence(0, 63), b -> ascii(substring(s, cast(1 + (b * cast(len AS bigint)) div 64 AS int), 1))) AS vals")
      .selectExpr("s", "vals",
        "aggregate(vals, 0L, (acc, v) -> acc + v) AS total")
      .selectExpr("s",
        """aggregate(sequence(0, 31), 0L, (acc, j) ->
             acc + CASE WHEN element_at(vals, j + 1) * 64 > total THEN shiftleft(1L, j) ELSE 0L END) AS lo""",
        """aggregate(sequence(0, 31), 0L, (acc, j) ->
             acc + CASE WHEN element_at(vals, j + 33) * 64 > total THEN shiftleft(1L, j) ELSE 0L END) AS hi""")
      .withColumn("ah", graft.functions.GraftFunctions.mediaAHash(
        org.apache.spark.sql.functions.col("s")))
      .selectExpr("lo", "hi", "element_at(ah, 1) AS klo", "element_at(ah, 2) AS khi")
    assert(both.filter("lo <> klo OR hi <> khi").isEmpty,
      both.collect().mkString("\n"))
    // and callable from SQL through the extensions registration
    org.apache.spark.sql.graftext.GraftExtensions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT graft_media_ahash('hello world of perceptual hashing') AS ah").head()
    assert(viaSql.getAs[scala.collection.Seq[Long]]("ah").length === 2)
  }
}
