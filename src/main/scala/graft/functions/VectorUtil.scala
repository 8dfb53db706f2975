package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Compiled kernels for the embedding operators' inner loops. The
  * higher-order-function formulations (`aggregate(zip_with(...))`) they
  * replace evaluate interpreted with per-element boxing and go
  * megamorphic as the registry grows — the same failure mode the text
  * hash kernels ([[TextHashUtil]]) eliminated. Each kernel folds
  * SEQUENTIALLY in index order, which is bit-for-bit the fold order of
  * both the HOF pipeline it replaces and the DuckDB oracle's
  * `list_aggregate(list_transform(...), 'sum')` — so swapping them in
  * changes no query result.
  *
  * Length mismatches FAIL LOUDLY: the embedding fixtures are declared
  * fixed-dimension, so a mismatched pair reaching a kernel is corrupt
  * input — silently folding a common prefix (or null-padding, the
  * `zip_with` behavior) would diverge from the documented semantics and
  * the oracle without any signal.
  */
object VectorUtil {

  private def checkDims(an: Int, bn: Int): Unit =
    if (an != bn) throw new IllegalArgumentException(
      s"vector kernel on mismatched dimensions: $an vs $bn — corrupt embedding input")

  /** Dot product: sum_i a(i)*b(i), sequential. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    checkDims(n, b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Squared L2 distance: sum_i (a(i)-b(i))^2, sequential. */
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    checkDims(n, b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  /** Product-quantization encode: `cb(j)(c)` is centroid c of subspace
    * j (all subspaces the same width). Returns the 8 codes packed 4
    * bits each (m = 8 subspaces, 16 centroids). Argmin scans centroids
    * in index order with strict `<`, so ties resolve to the SMALLEST
    * centroid index — the same tiebreak as the oracle's
    * `ORDER BY d, c`. */
  def pqCodes(v: ArrayData, cb: Array[Array[Array[Double]]]): Int = {
    val m = cb.length
    val dsub = cb(0)(0).length
    checkDims(v.numElements(), m * dsub)
    var packed = 0
    var j = 0
    while (j < m) {
      val cents = cb(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) { val d = v.getDouble(off + i) - cent(i); acc += d * d; i += 1 }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      packed |= best << (4 * j)
      j += 1
    }
    packed
  }

  /** Spark's `round(x, 6)` for a finite double, bit-for-bit:
    * `BigDecimal(d).setScale(6, HALF_UP).toDouble` is exactly what
    * catalyst's RoundBase evaluates for DoubleType (HALF_UP rounds a
    * half away from zero on both signs; NaN/Inf pass through in Spark,
    * not reachable here — distances and cosines are finite). Kept
    * private to the two rounded-argmin kernels; every other kernel
    * stays unrounded on purpose. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Lloyd-assignment encode: like [[pqCodes]] but the argmin runs over
    * the 6dp-ROUNDED subspace distance — the training trajectory's pin
    * (`round(l2sq, 6)` then smallest-centroid-index tiebreak, exactly
    * the `row_number OVER (ORDER BY d2, c)` the exploded-join
    * formulation evaluated). The BigDecimal rounding only runs for
    * candidates within 5e-7 of the incumbent ROUNDED best: for any
    * candidate with acc >= bestR + 5e-7, round6(acc) >= acc - 5e-7 >=
    * bestR, and rounded values are 1e-6-grid points, so it can never
    * beat a strictly smaller incumbent — the skip is exact, not a
    * heuristic. Ties on the rounded value keep the smaller index
    * (strict `<` scan in index order). */
  def pqAssignRounded(v: ArrayData, cb: Array[Array[Array[Double]]]): Int = {
    val m = cb.length
    val dsub = cb(0)(0).length
    checkDims(v.numElements(), m * dsub)
    var packed = 0
    var j = 0
    while (j < m) {
      val cents = cb(j)
      val off = j * dsub
      var best = 0
      var bestR = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) { val d = v.getDouble(off + i) - cent(i); acc += d * d; i += 1 }
        if (acc < bestR + 5e-7) {
          val r = round6(acc)
          if (r < bestR) { bestR = r; best = c }
        }
        c += 1
      }
      packed |= best << (4 * j)
      j += 1
    }
    packed
  }

  /** Coarse-cell assignment: index (ascending-cid position, not the cid
    * itself) of the centroid with the LARGEST 6dp-rounded cosine,
    * ties to the smallest cid — [[graft.operators.EmbeddingOps.ivfAssign]]'s
    * `row_number OVER (ORDER BY c_cos DESC, cid)` trajectory as one
    * codegen'd scan. `ces` must be ordered by ascending cid; `cns` are
    * the matching centroid norms; `nrm` is the row's norm. The same
    * exact-skip bound as [[pqAssignRounded]], mirrored for argmax. */
  def coarseAssignTop1(v: ArrayData, nrm: Double,
      ces: Array[Array[Double]], cns: Array[Double]): Int = {
    var best = 0
    var bestR = Double.MinValue
    var c = 0
    while (c < ces.length) {
      val ce = ces(c)
      val n = ce.length
      checkDims(v.numElements(), n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * ce(i); i += 1 }
      val cos = acc / (cns(c) * nrm)
      if (cos > bestR - 5e-7) {
        val r = round6(cos)
        if (r > bestR) { bestR = r; best = c }
      }
      c += 1
    }
    best
  }

  /** Asymmetric-distance (ADC) lookup against packed PQ codes, returned
    * as an exact integer micro-distance: each subspace's squared L2 to
    * the coded centroid is rounded to 1e-6 resolution and the EIGHT
    * integer contributions sum exactly — float-sum order can never
    * perturb the ranking, on either engine. */
  def pqAdcScaled(q: ArrayData, codes: Int, cb: Array[Array[Array[Double]]]): Long = {
    val m = cb.length
    val dsub = cb(0)(0).length
    checkDims(q.numElements(), m * dsub)
    var total = 0L
    var j = 0
    while (j < m) {
      val cent = cb(j)((codes >> (4 * j)) & 0xF)
      val off = j * dsub
      var acc = 0.0
      var i = 0
      while (i < dsub) { val d = q.getDouble(off + i) - cent(i); acc += d * d; i += 1 }
      total += Math.round(acc * 1000000.0 + 1e-9)
      j += 1
    }
    total
  }

  /** Integer dot product in the exact long domain: sum_i a(i)*b(i) with
    * each product widened to long — the codegen form of the quantized
    * cosine's `aggregate(zip_with(qa, qv, ...))` SQL-HOF fold, which ran
    * interpreted with per-element boxing in the hottest stage of
    * e_knn_quant / e_knn_rerank (10 query rows x corpus x 64 elements).
    * Integer addition is exact, so fold order cannot matter; this still
    * folds sequentially like the HOF for form's sake. */
  def dotIntLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    checkDims(n, b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getInt(i).toLong * b.getInt(i).toLong; i += 1 }
    acc
  }

  /** #{b in sorted `bounds` : b <= v} — binary upper-bound, the codegen
    * replacement for the equi-depth writer's two-level interpreted HOF
    * count (~31 boxed lambda calls per row per key column became ~log2
    * compares in generated code). Duplicate boundaries (mass concentrated
    * on one value) count fully, exactly like the HOF formulation, so
    * bucket ids skip but never reorder. */
  def upperBound(bounds: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Sign-bit half-word pack: bit j (0..31) set iff v(off + j) > 0 — the
    * codegen form of e_knn_hamming's 32-step `aggregate(sequence(...))`
    * SQL-HOF fold (which ran interpreted per element, the graft_dsir
    * lesson). Bits are disjoint powers of two, so OR here equals the
    * fold's sum bit-for-bit and the oracle hash is unchanged. Two 32-bit
    * halves, never one 64-bit word: bit 63 as a sign bit would overflow
    * DuckDB's checked BIGINT packing sum. */
  def signPack(v: ArrayData, off: Int): Long = {
    if (v.numElements() < off + 32) throw new IllegalArgumentException(
      s"signPack on ${v.numElements()} dims needs >= ${off + 32} — corrupt embedding input")
    var out = 0L
    var j = 0
    while (j < 32) {
      if (v.getDouble(off + j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Sign-bit LSH bucket: bit j set iff dot(v, planes(j)) > 0 — the fused
    * form of 8 separate dot-product sign tests. */
  def lshBucket(v: ArrayData, planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = p.length
      checkDims(v.numElements(), n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * p(i); i += 1 }
      if (acc > 0) bucket |= 1 << j
      j += 1
    }
    bucket
  }
}
