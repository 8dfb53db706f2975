package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Compiled kernels for the text-hashing operators. Semantics are locked
  * to the DuckDB oracle SQL: the base hash is the first 8 md5 hex digits
  * as uint32 (== first 4 digest bytes big-endian), shingles are token
  * trigrams joined by , permutations are (a*u + b) mod prime.
  *
  * Why a custom Expression (SURVEY.md §4.2 escape hatch): the equivalent
  * higher-order-function pipeline (transform/aggregate/array_min over
  * ~300-element arrays, 16 permutations) evaluates interpreted with
  * per-element boxing, and its call sites go megamorphic as more queries
  * run in the JVM — measured 10-30x slowdowns mid-benchmark. One codegen
  * call into a tight JVM loop removes all of it.
  */
object TextHashUtil {

  /** Smallest prime above 2^32 — modulus for the MinHash permutations.
    * THE shared constant: TextOps' pipelines/oracles and the SQL-function
    * registration must use the same values or SQL-computed signatures
    * silently diverge from the pipeline ones. */
  val MP: Long = 4294967311L
  /** The library's standard 16 permutations (a_i, b_i), 4 bands x 4 rows. */
  val perms: Seq[(Long, Long)] =
    (0 until 16).map(i => (2L * i + 3L, 1000003L * i + 12345L))

  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** First 4 md5 digest bytes as an unsigned 32-bit value — identical to
    * `conv(substring(md5(x),1,8),16,10)` / `('0x'||substr(md5(x),1,8))::BIGINT`. */
  def hash32(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** Trigram shingle bytes at position i: toks(i) 0x01 toks(i+1) 0x01
    * toks(i+2). ONE implementation ([[ngramBytes]] at n=3) shared by the
    * minhash and gram-set kernels — the DuckDB oracles hash the same
    * chr(1)-joined strings, so the families must never drift apart. */
  private def shingleBytes(toks: ArrayData, i: Int): Array[Byte] =
    ngramBytes(toks, i, 3)

  /** MinHash signature over token-trigram shingles, one pass: for each
    * i in [0, n-3], shingle = toks[i]  toks[i+1]  toks[i+2];
    * sig_k = min over shingles of (a_k*u + b_k) mod prime. (Shingle
    * dedup is a no-op under min, so none is needed.) */
  def minhashSig(toks: ArrayData, a: Array[Long], b: Array[Long], prime: Long): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = toks.numElements()
    var i = 0
    while (i <= n - 3) {
      val u = hash32(shingleBytes(toks, i))
      var j = 0
      while (j < k) {
        val h = (a(j) * u + b(j)) % prime
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First 15 md5 hex digits (60 bits) — fits a signed BIGINT in both
    * engines: == `('0x'||substr(md5(x),1,15))::BIGINT`. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** First 12 md5 hex digits (48 bits) == first 6 digest bytes big-endian
    * — identical to `conv(substring(md5(x),1,12),16,10)` /
    * `('0x'||substr(md5(x),1,12))::BIGINT`. The string-free path for the
    * HLL bucket hash: the built-in composition allocates the 32-char hex
    * rendering and re-parses it per row. */
  def hash48(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v
  }

  /** Sorted distinct 60-bit hashes of the token-trigram shingles — the
    * per-document set representation for exact Jaccard verification
    * (8 bytes/shingle through the shuffle instead of a ~25-byte string). */
  def trigramHashes(toks: ArrayData): ArrayData = ngramHashes(toks, 3)

  /** N-token shingle bytes at position i: toks(i) 0x01 ... 0x01
    * toks(i+n-1) — the generalization of [[shingleBytes]] to any n; the
    * DuckDB oracles hash the same chr(1)-joined strings. */
  private def ngramBytes(toks: ArrayData, i: Int, n: Int): Array[Byte] = {
    var len = n - 1
    var j = 0
    while (j < n) { len += toks.getUTF8String(i + j).numBytes(); j += 1 }
    val buf = new Array[Byte](len)
    var off = 0
    j = 0
    while (j < n) {
      val t = toks.getUTF8String(i + j).getBytes
      System.arraycopy(t, 0, buf, off, t.length)
      off += t.length
      if (j < n - 1) { buf(off) = 1; off += 1 }
      j += 1
    }
    buf
  }

  /** Sorted distinct 60-bit hashes of the n-token shingles — the
    * [[trigramHashes]] representation at any gram width (13 for
    * benchmark decontamination). */
  def ngramHashes(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    val m = math.max(0, cnt - n + 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = hash60(ngramBytes(toks, i, n))
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** POSITION-ORDERED 48-bit hashes of the n-token shingles — one hash
    * per start offset, neither sorted nor deduplicated (element i is the
    * window toks(i..i+n-1)), for operators that need the gram's location
    * (duplicated-SPAN coverage), unlike [[ngramHashes]]'s set form.
    * 48-bit (== [[hash48]] of the chr(1)-joined window) so the DuckDB
    * oracle's `('0x'||substr(md5(...),1,12))::BIGINT` recomputes each
    * element bit-for-bit. */
  def ngramHashesPos(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    val m = math.max(0, cnt - n + 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = hash48(ngramBytes(toks, i, n))
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** DSIR feature buckets of a token array: 1024-bucket [[hash32]] of
    * every unigram then every SPACE-joined bigram, in token order — the
    * exact value set of the oracle's
    * `('0x'||substr(md5(gram),1,8))::BIGINT % 1024` over
    * `toks || list_transform(range(1, len), i -> toks[i] || ' ' || toks[i+1])`,
    * computed from the tokens' UTF-8 bytes without building gram
    * strings (the HOF formulation ran interpreted at ~6 us/gram). */
  def dsirBuckets(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Int](if (n >= 2) 2 * n - 1 else n)
    var i = 0
    while (i < n) {
      out(i) = (hash32(toks.getUTF8String(i).getBytes) % 1024L).toInt
      i += 1
    }
    i = 0
    while (i < n - 1) {
      out(n + i) = (hash32(bigramBytes(toks, i)) % 1024L).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sum of `lam(bucket)` over the SAME buckets [[dsirBuckets]] emits —
    * the DSIR apply fold as one static call (exact micro-nat integers,
    * order-independent sum). */
  def dsirFoldMicro(toks: ArrayData, lam: Array[Long]): Long = {
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += lam((hash32(toks.getUTF8String(i).getBytes) % 1024L).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      sum += lam((hash32(bigramBytes(toks, i)) % 1024L).toInt)
      i += 1
    }
    sum
  }

  /** UTF-8 bytes of `toks(i) ++ ' ' ++ toks(i+1)` — the space-joined
    * bigram string, byte-exact with the oracle's `||' '||` concat. */
  private def bigramBytes(toks: ArrayData, i: Int): Array[Byte] = {
    val a = toks.getUTF8String(i).getBytes
    val b = toks.getUTF8String(i + 1).getBytes
    val buf = new Array[Byte](a.length + 1 + b.length)
    System.arraycopy(a, 0, buf, 0, a.length)
    buf(a.length) = ' '
    System.arraycopy(b, 0, buf, a.length + 1, b.length)
    buf
  }

  /** Intersection size of two sorted distinct long arrays (linear merge). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** 32-bit SimHash over ALL tokens (frequency-weighted): bit j is set
    * when sum over tokens of +/-1 (bit j of the token hash) is positive. */
  def simhash32(toks: ArrayData): Long = {
    val counters = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val u = hash32(toks.getUTF8String(i).getBytes)
      var j = 0
      while (j < 32) {
        if (((u >> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** 64-bit perceptual aHash over a (pre-normalized) string's decoded
    * signal, as [lo, hi] 32-bit halves: sample 64 evenly-spaced
    * codepoints (position b = (b*len) div 64, 0-based), bit b set iff
    * sample_b * 64 > sum of samples (the integer form of "above the
    * grid mean"). One codepoint pass, zero per-row allocations beyond
    * the two fixed arrays — the codegen replacement for the
    * interpreted transform/aggregate HOF chain, which re-evaluated per
    * reference and measured ~1 ms/doc (BASELINE.md round-18
    * m_media_neardup note). Codepoint domain matches Spark's
    * length()/substring()/ascii() and DuckDB's length()/substr()/
    * ascii(), so the cross-engine hash is unchanged. */
  def mediaAHash(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    if (len < 1) return new GenericArrayData(Array(0L, 0L))
    val vals = new Array[Int](64)
    var total = 0L
    var b = 0
    while (b < 64) {
      val v = cps(((b.toLong * len) / 64).toInt)
      vals(b) = v; total += v; b += 1
    }
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < 32) {
      if (vals(j) * 64L > total) lo |= 1L << j
      if (vals(j + 32) * 64L > total) hi |= 1L << j
      j += 1
    }
    new GenericArrayData(Array(lo, hi))
  }
}

/** Public Column API, delegating to the Expression definitions that live
  * under the org.apache.spark.sql namespace (Catalyst's Expression SPI
  * types are private[sql]). */
object GraftFunctions {
  def minhashSig(tokens: org.apache.spark.sql.Column, a: Seq[Long], b: Seq[Long],
      prime: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.minhashSig(tokens, a, b, prime)

  def simhash32(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.simhash32(tokens)

  def mediaAHash(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.mediaAHash(s)

  def ngramHashes(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.ngramHashes(tokens, n)

  /** Position-ordered (unsorted, undeduplicated) 48-bit n-gram window
    * hashes — the span-coverage form of [[ngramHashes]]. */
  def ngramHashesPos(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.ngramHashesPos(tokens, n)

  def trigramHashes(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.trigramHashes(tokens)

  def sortedIntersectCount(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.sortedIntersectCount(a, b)

  def md5Hash48(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.md5Hash48(s)

  def dsirBuckets(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.dsirBuckets(tokens)

  def dsirFoldMicro(tokens: org.apache.spark.sql.Column,
      lam: Seq[Long]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.dsirFoldMicro(tokens, lam)

  def vecDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.vecDot(a, b)

  def vecL2Sq(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.vecL2Sq(a, b)

  def lshBucket(v: org.apache.spark.sql.Column,
      planes: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.lshBucket(v, planes)

  /** Sign-bit half-word pack: bit j set iff v(off + j) > 0, 32 bits per
    * call — e_knn_hamming's corpus pack pass, codegen'd. */
  def signPack(v: org.apache.spark.sql.Column, off: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.signPack(v, off)

  /** Equi-depth bucket id: count of sorted boundaries <= v (binary
    * upper-bound, codegen; null input -> null — callers that want the
    * null-to-bucket-0 convention coalesce). */
  def bucketOf(v: org.apache.spark.sql.Column,
      boundaries: Seq[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.bucketOf(v, boundaries)

  def pqCodes(v: org.apache.spark.sql.Column,
      cb: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.pqCodes(v, cb)

  def pqAdcScaled(q: org.apache.spark.sql.Column, codes: org.apache.spark.sql.Column,
      cb: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.pqAdcScaled(q, codes, cb)

  /** Exact-long integer dot product over two int arrays — the codegen
    * form of the quantized-cosine HOF fold (e_knn_quant/e_knn_rerank's
    * candidate stage). */
  def intDotLong(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.intDotLong(a, b)

  /** Lloyd-assignment PQ encode: 6dp-ROUNDED per-subspace argmin with
    * smallest-index tiebreak, packed 4 bits/code — the training
    * trajectory's assignment pin as one codegen'd pass (vs the
    * exploded broadcast join + window sort it replaces). */
  def pqAssignRounded(v: org.apache.spark.sql.Column,
      cb: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.pqAssignRounded(v, cb)

  /** Coarse top-1 cell assignment: position (in ascending-cid order) of
    * the centroid with the largest 6dp-rounded cosine, ties to the
    * smallest cid — ivfAssign's maxRank=1 trajectory, codegen'd. */
  def coarseAssignTop1(v: org.apache.spark.sql.Column,
      nrm: org.apache.spark.sql.Column,
      ces: Seq[Seq[Double]], cns: Seq[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.coarseAssignTop1(v, nrm, ces, cns)

  /** Mergeable decimal-DDSketch quantile aggregate —
    * struct<n_vals, q50, q95, q99>. */
  def ddSketch(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.ddSketch(c)

  /** Weighted decimal-DDSketch quantiles: each value counts `w` (long)
    * times — struct<n_weight, q50, q95, q99>, same constant state. */
  def ddSketchW(c: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.ddSketchW(c, w)

  /** Exact bounded top-k aggregate: the k strongest (score desc, id
    * asc) entries of the group as array<struct<id, score, rnk>> —
    * k-entry state, map-side partial collapse, merge-order-invariant. */
  def topK(score: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.topK(score, id, k)

  /** Parameterized variant: struct<n_vals, qs array<double>> answering
    * the given quantile list (each in (0, 1]). */
  def ddSketchQ(c: org.apache.spark.sql.Column,
      qs: Seq[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.ddSketchQ(c, qs)

  /** Single-pass KL(group ‖ reference) over the 1024 DSIR buckets:
    * struct<n_grams, kl_micro> from the group's exact bucket histogram
    * (8 KiB constant state, mergeable) against the calibrated reference
    * counts — t_source_kl's term sum in one stateful stage, the shape a
    * windowed streaming aggregation requires. */
  def sourceKl(bucket: org.apache.spark.sql.Column, nb: Seq[Long],
      nn: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.columns.sourceKl(bucket, nb, nn)
}
