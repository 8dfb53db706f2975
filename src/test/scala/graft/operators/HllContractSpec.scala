package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The q_hll_distinct oracle row is FIXTURE-PINNED: the DuckDB side
  * hardcodes `within_3rsd = 1`, which is a deterministic property of
  * (fixture, rsd config, Spark's HLL++ implementation) — a new fixture
  * or a Spark upgrade can flip that row red with no engine bug (see the
  * gate scaladoc in RelationalOps). This spec is the early-warning
  * system that pin needs: it re-proves the estimator CONTRACT locally,
  * on every fixture the driver gate uses AND on synthetic cardinalities
  * across regimes, so a drift flips a test here — with a message saying
  * "re-verify and re-pin" — before (or instead of) an opaque oracle
  * hash mismatch. */
class HllContractSpec extends SparkSpec {

  test("q_hll_distinct gate bit holds on every local fixture the oracle sees") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val rows = SparkEntry.queries("q_hll_distinct")(spark, dir)
        .select("l_returnflag", "within_3rsd").collect()
      assert(rows.nonEmpty, s"gate query empty at $dir")
      rows.foreach { r =>
        assert(r.getInt(1) === 1,
          s"HLL++ estimator left the 3*rsd envelope for flag ${r.getString(0)} " +
            s"at $dir — re-verify the contract and re-pin the oracle constant")
      }
    }
  }

  test("HLL++ contract: |approx - n| <= 3*rsd*n across cardinality regimes") {
    val s = spark
    // 0.05 is approx_count_distinct's default rsd; the 3x envelope is the
    // same slack the pinned gate uses. Regimes: sparse (linear-counting
    // territory), mid, and dense (well past the fixtures' cardinality).
    Seq(100L, 10000L, 1000000L).foreach { n =>
      val est = s.range(n).agg(approx_count_distinct(col("id"))).head().getLong(0)
      assert(math.abs(est - n) <= math.ceil(3 * 0.05 * n).toLong,
        s"HLL++ estimate $est for n=$n violates the 3*rsd contract")
    }
  }
}
