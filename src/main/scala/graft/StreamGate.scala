package graft

/** Per-cell STREAMING throughput regression gate (round-18 verdict
  * task 5) — [[BenchGate]]'s discipline applied to [[StreamBench]]:
  * batch queries have had a committed per-query ledger since round 17,
  * but the 20+ streaming cells quoted in BASELINE.md every round had no
  * committed reference, so a streaming-dual regression would only be
  * caught by a human reading prose.
  *
  * Ledger contract (`stream_ref.json`):
  *  - records, per cell, the BEST (maximum) host-normalized rows/sec
  *    ever measured at the ledger's event count, plus that count —
  *    throughput is the inverse axis of seconds, so normalization
  *    MULTIPLIES by host_ratio (a slow host deflates measured rows/s;
  *    the divisor Bench applies to seconds becomes a multiplier here)
  *    and the ledger merge takes the max.
  *  - the gate only applies when the run's n_events matches the
  *    ledger's — cells' fixed setup costs (checkpoint restarts,
  *    generation swaps) don't scale linearly, so cross-n comparisons
  *    would grade the protocol, not the pipeline.
  *  - a cell regresses when its normalized rows/s falls below
  *    1/[[RatioLimit]] of its reference. No absolute floor: unlike the
  *    batch registry's 0.03-0.15 s micro plans, every cell pushes
  *    thousands of rows through a full start-drain-stop cycle, so its
  *    noise is proportional, and single-shot cells (no min-of-passes)
  *    get the wider 2.5x band instead.
  *  - `SPARK_GRAFT_UPDATE_REF=1` merges (per-cell max, new cells
  *    added); committing the file is a reviewed act.
  */
object StreamGate {

  val RefFile = "stream_ref.json"
  /** A cell fails when normalized rows/s < reference / RatioLimit.
    * 2.5, not the batch gate's 2.0: StreamBench cells are single-shot
    * (one drain per round, no min-of-passes to shed stall hits), so
    * their round-over-round spread is wider by protocol. */
  val RatioLimit = 2.5

  final case class Ref(n: Int, rps: Map[String, Double])
  final case class Regression(
      cell: String, refRps: Double, normRps: Double, ratio: Double)

  /** Cells whose host-normalized throughput fell below 1/RatioLimit of
    * their reference. Unreferenced cells never regress (first
    * measurement seeds at the next ledger update). */
  def regressions(ref: Map[String, Double],
      norm: Map[String, Double]): Seq[Regression] =
    norm.toSeq.sortBy(_._1).flatMap { case (c, m) =>
      ref.get(c).collect {
        case r if r > 0 && m < r / RatioLimit =>
          Regression(c, r, m, if (m > 0) r / m else Double.PositiveInfinity)
      }
    }

  /** Ledger merge: per-cell MAX of reference and this run's normalized
    * throughput; new cells enter at their measurement. */
  def merged(ref: Map[String, Double],
      norm: Map[String, Double]): Map[String, Double] =
    (ref.keySet ++ norm.keySet).map { c =>
      c -> math.max(ref.getOrElse(c, 0.0), norm.getOrElse(c, 0.0))
    }.toMap

  // Same writer-owns-the-shape regex parsing as BenchGate — no JSON
  // library on the bench classpath.
  private val nRe = """"n_events"\s*:\s*(\d+)""".r
  private val entryRe = """"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)""".r

  def load(path: String = RefFile): Option[Ref] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) None
      else {
        val txt = java.nio.file.Files.readString(p)
        val n = nRe.findFirstMatchIn(txt).map(_.group(1).toInt)
        val body = txt.indexOf("\"norm_rps\"") match {
          case -1 => ""
          case i => txt.substring(i + "\"norm_rps\"".length)
        }
        n.map(v => Ref(v,
          entryRe.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def save(path: String, n: Int, rps: Map[String, Double]): Unit = {
    def num(d: Double): String =
      "%.1f".formatLocal(java.util.Locale.ROOT, d)
    val body = rps.toSeq.sortBy(_._1)
      .map { case (c, v) => s""""$c":${num(v)}""" }
      .grouped(4).map(_.mkString(",")).mkString(",\n    ")
    val txt =
      s"""{
  "n_events": $n,
  "note": "best host-normalized rows/sec per StreamBench cell (measured_rps * host_ratio); gate = no cell below reference/${RatioLimit}; refresh via SPARK_GRAFT_UPDATE_REF=1",
  "norm_rps": {
    $body
  }
}
"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), txt)
    ()
  }

  /** Compact JSON for the stdout gate block (cap — the consumer tails
    * the line). */
  def regsJson(regs: Seq[Regression], cap: Int = 8): String = {
    // A drained-zero-rows cell has ratio = +Infinity, and "%.1f" would
    // render it as unquoted `Infinity` — invalid JSON on the gate line
    // precisely when a cell is most broken. Clamp every non-finite
    // value to a large finite sentinel instead.
    def num(d: Double): String =
      "%.1f".formatLocal(java.util.Locale.ROOT,
        if (java.lang.Double.isFinite(d)) d else 9.0e9)
    regs.take(cap).map(r =>
      s"""{"cell":"${r.cell}","ref":${num(r.refRps)},"norm":${num(r.normRps)},"ratio":${num(r.ratio)}}""")
      .mkString("[", ",", "]")
  }
}
