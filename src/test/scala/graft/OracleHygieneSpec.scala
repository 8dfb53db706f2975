package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the DuckDB oracle SQL against constructs whose semantics have
  * varied across engine versions or environments — the class of failure
  * behind round 4's only red driver row (a11: `to_microseconds` interval
  * arithmetic meeting TIMESTAMP_NS parquet inputs produced sub-µs sort
  * tie-breaks one DuckDB build resolved differently than Spark). The
  * sandbox cannot install a second DuckDB to difference-test against, so
  * the structural rule is: sub-second time arithmetic and session-
  * dependent values are banned from oracles outright; coarse
  * (minute-granularity) `time_bucket`/INTERVAL use is fine and four
  * rounds of green driver rows back that. Queries needing sub-second
  * precision must compute in integer epoch-microseconds end to end, the
  * way a11/a2b/d_pack_sequences do.
  */
class OracleHygieneSpec extends AnyFunSuite {

  private val banned = Seq(
    "to_microseconds", // sub-µs interval construction — the a11 burn
    "to_milliseconds",
    "to_nanoseconds",
    "epoch_ns", // only exists in newer DuckDB builds
    "microsecond'", // INTERVAL 'N microsecond...'
    "millisecond'",
    "now()", // session-dependent
    "current_timestamp",
    "current_date",
    "get_current_timestamp",
    "random()", // nondeterministic
    "setseed")

  test("no oracle uses version-fragile or nondeterministic constructs") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      low = sql.toLowerCase
      b <- banned if low.contains(b)
    } yield s"$name uses $b"
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("every registered query either has an oracle or is declared rows-only") {
    // rows-only queries (engine-specific sketches) must be the exception,
    // enumerated here so a silently-dropped oracle cannot hide
    val rowsOnly = Set("q_hll_distinct")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle coverage: $missing")
  }
}
