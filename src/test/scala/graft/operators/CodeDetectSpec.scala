package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t_code_detect on crafted documents: the synthetic prose fixture never
  * crosses the threshold (the oracle pins counts, not the verdict), so
  * this spec owns BOTH sides of the is_code boundary plus the exact
  * density arithmetic on known strings. */
class CodeDetectSpec extends SparkSpec {

  test("code crosses the threshold, prose does not, densities are the exact counts") {
    val s = spark
    import s.implicits._
    val code =
      "def f(x) {\n    y = x + 1;\n    z = y * 2;\n    return z;\n}\n" +
        "for (i = 0; i < 10; i = i + 1) {\n    g(i);\n}"
    val prose =
      "The quiet harbor town woke slowly under a pale sky.\n" +
        "Fishermen coiled their ropes and talked about the weather.\n" +
        "Nothing about the morning suggested what came next."
    val indentOnly = "plain line\n    indented one\n    indented two\n\tindented tab"
    val docs = Seq(
      (1L, code, code.length.toLong),
      (2L, prose, prose.length.toLong),
      (3L, indentOnly, indentOnly.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("codedet").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("t_code_detect")(s, dir)
      .selectExpr("doc_id", "braces", "semis", "eqs", "indented_lines",
        "code_score", "is_code")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    val (_, braces, semis, eqs, indented, score, isCode) = out(1L)
    assert(braces === 4L) // two blocks, open+close each
    assert(semis === 6L) // 3 statements + 2 for-header clauses + g(i)
    assert(eqs === 4L) // y=, z=, i=0, i=i+1 (< and + are not =)
    assert(indented === 4L)
    assert(isCode, s"code doc scored $score — below threshold")

    assert(out(2L)._6 < 15L && !out(2L)._7, s"prose flagged as code: ${out(2L)}")

    // indentation alone (3 of 4 lines) contributes 3*10/4 = 7 — real
    // signal, but not enough to cross without operator density
    assert(out(3L)._5 === 3L)
    assert(!out(3L)._7, s"indent-only doc misrouted: ${out(3L)}")
  }

  test("a >2.1M-signal-char document does not wrap in 32-bit (ADVICE r13)") {
    val s = spark
    import s.implicits._
    // 3M semicolons: (braces+semis+eqs) * 1000 = 3e9 > Int.MaxValue —
    // the pre-fix INT-typed arithmetic wrapped this negative while the
    // BIGINT oracle did not, a silent cross-engine divergence
    val big = ";" * 3000000
    val docs = Seq((1L, big, big.length.toLong)).toDF("doc_id", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("codedet-big").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t_code_detect")(s, dir)
      .selectExpr("semis", "code_score", "is_code")
      .as[(Long, Long, Boolean)].head()
    assert(r._1 === 3000000L)
    // 3e6 signal chars / 3e6 chars * 1000 = exactly 1000, positive
    assert(r._2 === 1000L, s"code_score wrapped or misscaled: ${r._2}")
    assert(r._3)
  }
}
