package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the round-19 Lloyd-assignment kernel swap: the codegen'd
  * [[GraftFunctions.pqAssignRounded]] / [[GraftFunctions.coarseAssignTop1]]
  * scans must reproduce BIT-FOR-BIT the historical exploded-broadcast-join
  * + window-sort formulations they replaced (round(…, 6) distances,
  * smallest-index tiebreak) — the training trajectories behind
  * e_knn_pq_trained / e_knn_opq / e_knn_opq3 / every ivf_pq flavor are
  * pinned to those semantics by their DuckDB oracles, so any divergence
  * here is a correctness bug, not a performance detail. Includes crafted
  * sub-1e-6 near-ties where the ROUNDED argmin disagrees with the raw
  * argmin — the exact shape a naive unrounded kernel would get wrong.
  */
class PqAssignKernelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(421)

  private def randVec(n: Int): Seq[Double] =
    Seq.fill(n)(math.rint(rnd.nextDouble() * 2e6 - 1e6) / 1e6)

  test("pqAssignRounded == exploded-join+window argmin, random + near-tie vectors") {
    val cb: Seq[Seq[Seq[Double]]] =
      Seq.fill(8)(Seq.fill(16)(randVec(8)))
    // two centroids of subspace 0 made an exact near-tie target: c=3 at
    // distance d, c=1 at distance d + 4e-7 — rounding at 6dp collapses
    // them and the tiebreak must pick c=1 (the smaller index), while a
    // raw argmin would pick c=3
    val tieBase = randVec(8)
    val cbTied = cb.updated(0, cb(0)
      .updated(1, tieBase.map(_ + 0.0002))
      .updated(3, tieBase.map(x => x + 0.0002 - 2.4e-8)))
    val vecs = (Seq.tabulate(40)(_ => randVec(64)) :+
      (tieBase ++ randVec(56))).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("vec_id", "ed")

    val kernel = df.select(col("vec_id"),
        GraftFunctions.pqAssignRounded(col("ed"), cbTied).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // the historical formulation, verbatim
    val sub = df.select(col("vec_id"), explode(expr(
        "transform(sequence(0, 7), j -> struct(cast(j AS int) AS j, slice(ed, cast(j*8+1 AS int), 8) AS sv))")).as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.sv").as("sv"))
    val cents = cbTied.zipWithIndex.flatMap { case (cs, j) =>
      cs.zipWithIndex.map { case (cv, c) => (j, c, cv) }
    }.toDF("j", "c", "cv")
    val assignW = Window.partitionBy("vec_id", "j").orderBy(col("d2"), col("c"))
    val win = sub.join(broadcast(cents), Seq("j"))
      .withColumn("d2", round(GraftFunctions.vecL2Sq(col("sv"), col("cv")), 6))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("j"), col("c"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.foldLeft(0)((acc, r) => acc | (r.getInt(2) << (4 * r.getInt(1))))
      }

    assert(kernel === win)
    // the crafted near-tie really exercised the rounding path: subspace-0
    // code of the tie vector must be 1 (rounded tie, smaller index wins)
    assert((kernel(40L) & 0xF) === 1)
  }

  test("coarseAssignTop1 == broadcast-join+window cosine argmax, incl. rounded ties") {
    val cents0 = Seq.tabulate(16)(c => (10L + c, randVec(64)))
    // cid 11 made exactly parallel to cid 10 (double the vector): every
    // row's cosine against the two is IDENTICAL, so the rounded argmax
    // ties whenever cid 10/11 win and the smaller cid must be chosen
    val cents = cents0.updated(1, (11L, cents0.head._2.map(_ * 2)))
    val vecs = Seq.tabulate(50)(i => (100L + i, randVec(64)))
      .map { case (id, v) => (id, v, math.sqrt(v.map(x => x * x).sum)) }
    val df = vecs.toDF("vec_id", "ed", "nrm")
    val cdf = cents.map { case (cid, ce) =>
      (cid, ce, math.sqrt(ce.map(x => x * x).sum))
    }.toDF("cid", "ce", "cn")

    val assignW = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cid"))
    val win = df.join(broadcast(cdf))
      .withColumn("c_cos",
        round(GraftFunctions.vecDot(col("ce"), col("ed")) / (col("cn") * col("nrm")), 6))
      .withColumn("arn", row_number().over(assignW))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val cidArr = cents.map(_._1).sorted
    val ces = cents.sortBy(_._1).map(_._2)
    val cns = cents.sortBy(_._1).map(c => math.sqrt(c._2.map(x => x * x).sum))
    val kernel = df.select(col("vec_id"),
        GraftFunctions.coarseAssignTop1(col("ed"), col("nrm"), ces, cns).as("p"))
      .collect().map(r => r.getLong(0) -> cidArr(r.getInt(1))).toMap

    assert(kernel === win)
  }
}
