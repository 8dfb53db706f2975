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

  // Round-5 lesson: DuckDB types sum(BIGINT/INT) — window sums included —
  // as HUGEINT; Spark emits BIGINT; the driver hashes TYPED values, so an
  // untyped sum in an oracle's final SELECT fails the driver gate even at
  // exact value equality (a11_peak_concurrency, d_pack_sequences,
  // t_vocab_coverage were red 2 rounds on exactly this). The authoritative
  // check needs DuckDB itself, which lives in the driver-side Python — so
  // dump the oracle strings and shell out to tools/type_audit.py, which
  // DESCRIBEs every oracle and bans HUGEINT output columns. Skips (does
  // not fail) when python3+duckdb or the fixture dir is unavailable.
  test("no oracle output column is HUGEINT-typed (DuckDB DESCRIBE audit)") {
    import scala.sys.process._
    val sfdir = "/root/testdata/sf0.001"
    val pyOk = scala.util.Try(
      Seq("python3", "-c", "import duckdb").! == 0).getOrElse(false)
    assume(pyOk && new java.io.File(sfdir).isDirectory,
      "python3+duckdb or fixture dir unavailable — audit runs via tools/check.py instead")
    val tmp = java.io.File.createTempFile("oracle_sql", ".json")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try w.write(SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => quote(k) + ": " + quote(v) }
      .mkString("{", ",\n", "}"))
    finally w.close()
    val out = new StringBuilder
    val code = Seq("python3", "tools/type_audit.py", tmp.getAbsolutePath, sfdir)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"HUGEINT-typed oracle output:\n$out")
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  test("every registered query either has an oracle or is declared rows-only") {
    // rows-only queries (engine-specific sketches) must be the exception,
    // enumerated here so a silently-dropped oracle cannot hide
    val rowsOnly = Set("q_hll_distinct")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle coverage: $missing")
  }
}
