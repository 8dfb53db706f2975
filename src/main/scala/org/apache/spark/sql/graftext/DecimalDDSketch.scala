package org.apache.spark.sql.graftext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable relative-error quantile sketch as a Catalyst
  * [[TypedImperativeAggregate]] — the DDSketch idea (Masson et al.,
  * VLDB'19: fixed-size bucketed histogram with a relative-accuracy
  * guarantee, buckets merge by count addition) restated on DECIMAL
  * buckets so every step is integer-exact and engine-portable:
  *
  *   bucket(x) = (#digits of ⌊x⌋, first two digits of ⌊x⌋)
  *
  * i.e. two significant decimal digits + the decimal magnitude, encoded
  * as `mag * 100 + lead2`. Values below 1 share the underflow bucket 0;
  * the domain is clamped at 1e15 so ⌊x⌋ always fits a long. Guarantees:
  *
  *   - relative error ≤ 1/(2·lead2) ≤ 5% per reported quantile (the
  *     representative value is the bucket midpoint);
  *   - the buffer is ≤ 90·magnitudes ≈ 1.4 k counters REGARDLESS of
  *     input size — constant memory at 100 TB;
  *   - merge is count addition, so the result is MERGE-ORDER-INVARIANT:
  *     unlike rank-based sketches (KLL/GK) the estimate is a pure
  *     function of the value multiset, which is what lets the DuckDB
  *     oracle recompute it bit-for-bit with plain SQL (no contract
  *     gate needed — the estimates themselves hash-match).
  *
  * The quantile rule is the classic inverted-CDF: the q-quantile is the
  * representative of the first bucket whose cumulative count reaches
  * max(1, ⌈q·n⌉), walking buckets in ascending (mag, lead2) order.
  *
  * Fixed output quantiles (0.50, 0.95, 0.99) as a
  * struct<n_vals, q50, q95, q99> — the latency-report shape.
  */
case class DecimalDDSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Int, Long]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dd_sketch"

  override def dataType: DataType = StructType(Seq(
    StructField("n_vals", LongType, nullable = false),
    StructField("q50", DoubleType, nullable = true),
    StructField("q95", DoubleType, nullable = true),
    StructField("q99", DoubleType, nullable = true)))

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty[Int, Long]

  override def update(
      buffer: mutable.HashMap[Int, Long],
      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN) {
        val b = DecimalDDSketch.bucket(x)
        buffer.update(b, buffer.getOrElse(b, 0L) + 1L)
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[Int, Long],
      b2: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  override def eval(buffer: mutable.HashMap[Int, Long]): Any = {
    val n = buffer.valuesIterator.sum
    if (n == 0L) {
      InternalRow(0L, null, null, null)
    } else {
      def q(p: Double) = DecimalDDSketch.quantileOf(buffer, n, p)
      InternalRow(n, q(0.50), q(0.95), q(0.99))
    }
  }

  override def serialize(buffer: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) => out.writeInt(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val m = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < size) { m.update(in.readInt(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalDDSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalDDSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DecimalDDSketch =
    copy(child = newChildren.head)
}

object DecimalDDSketch {
  /** Domain clamp: ⌊x⌋ must fit exactly in a long AND keep its decimal
    * digit count stable under the double→long floor. 1e15 − 1. */
  val MaxDomain: Double = 999999999999999.0

  /** `mag * 100 + lead2` with the underflow bucket 0 for x < 1. Negative
    * and sub-1 values share bucket 0 — the sketch targets non-negative
    * measures (latencies, prices, sizes). Mirrored in SQL by the oracle
    * (integer/string ops only, no transcendentals). */
  def bucket(x: Double): Int = {
    val v = math.min(x, MaxDomain)
    if (v < 1.0) 0
    else {
      val m = math.floor(v).toLong
      val s = java.lang.Long.toString(m)
      val mag = s.length
      val lead2 = if (mag == 1) s.toInt * 10 else s.substring(0, 2).toInt
      mag * 100 + lead2
    }
  }

  /** Bucket representative: the midpoint of [lead2·10^(mag−2),
    * (lead2+1)·10^(mag−2)). math.pow(10, k) is exact for |k| ≤ 15 in
    * every IEEE libm (and 10^−1 rounds to the same double as the 0.1
    * literal), so the representative is bit-identical cross-engine. */
  def rep(bucket: Int): Double =
    if (bucket == 0) 0.5
    else ((bucket % 100) + 0.5) * math.pow(10.0, bucket / 100 - 2)

  /** Inverted-CDF walk shared by both aggregate variants: the
    * representative of the first bucket whose cumulative count reaches
    * max(1, ⌈q·n⌉), ascending (mag, lead2) order. */
  def quantileOf(buffer: mutable.HashMap[Int, Long], n: Long, q: Double): Double = {
    val keys = buffer.keysIterator.toArray.sorted
    val k = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < keys.length) {
      cum += buffer(keys(i))
      if (cum >= k) return rep(keys(i))
      i += 1
    }
    rep(keys.last)
  }
}

/** Parameterized-quantile variant of [[DecimalDDSketch]]: same buckets,
  * same merge-order-invariant histogram state, but the reported
  * quantiles come from a FOLDABLE array<double> second argument instead
  * of the fixed (0.50, 0.95, 0.99) — `graft_dd_sketch_q(x,
  * array(0.25D, 0.999D))`. Output struct<n_vals, qs array<double>>,
  * `qs[i]` answering `quantiles[i]`. Tail quantiles (q = 0.999…) at
  * 100 TB cost the same constant state as the median. */
case class DecimalDDSketchQ(
    child: Expression,
    quantiles: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Int, Long]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child, quantiles)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, ArrayType(DoubleType))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dd_sketch_q"

  @transient private lazy val qs: Array[Double] = {
    require(quantiles.foldable, s"$prettyName: quantiles must be a literal array")
    val arr = quantiles.eval(InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr != null && arr.numElements() > 0,
      s"$prettyName: quantiles must be a non-empty array")
    val out = arr.toDoubleArray()
    out.foreach(q => require(q > 0.0 && q <= 1.0,
      s"$prettyName: quantile $q outside (0, 1]"))
    out
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_vals", LongType, nullable = false),
    StructField("qs", ArrayType(DoubleType), nullable = true)))

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty[Int, Long]

  override def update(
      buffer: mutable.HashMap[Int, Long],
      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN) {
        val b = DecimalDDSketch.bucket(x)
        buffer.update(b, buffer.getOrElse(b, 0L) + 1L)
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[Int, Long],
      b2: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  override def eval(buffer: mutable.HashMap[Int, Long]): Any = {
    val n = buffer.valuesIterator.sum
    if (n == 0L) InternalRow(0L, null)
    else InternalRow(n, new org.apache.spark.sql.catalyst.util.GenericArrayData(
      qs.map(q => DecimalDDSketch.quantileOf(buffer, n, q))))
  }

  override def serialize(buffer: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) => out.writeInt(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val m = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < size) { m.update(in.readInt(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalDDSketchQ =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalDDSketchQ =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DecimalDDSketchQ =
    copy(child = newChildren(0), quantiles = newChildren(1))
}

/** WEIGHTED variant of [[DecimalDDSketch]]: each value contributes its
  * long `weight` to the bucket count instead of 1 — the importance-
  * weighted quantile a curation pipeline needs (quantiles of document
  * quality weighted by token count, of price weighted by quantity, …).
  * Weights are LONGS so the histogram stays integer-exact and
  * merge-order-invariant, and the oracle recomputes the estimates from
  * `sum(weight)` bit-for-bit. Null/NaN values and null or non-positive
  * weights contribute nothing (a zero weight is a no-op by definition;
  * negative weights have no quantile meaning and are ignored rather
  * than corrupting the CDF). Same constant ≤ ~1.4k-counter state. */
case class DecimalDDSketchW(
    child: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Int, Long]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child, weight)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dd_sketch_w"

  override def dataType: DataType = StructType(Seq(
    StructField("n_weight", LongType, nullable = false),
    StructField("q50", DoubleType, nullable = true),
    StructField("q95", DoubleType, nullable = true),
    StructField("q99", DoubleType, nullable = true)))

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty[Int, Long]

  override def update(
      buffer: mutable.HashMap[Int, Long],
      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val x = v.asInstanceOf[Double]
      val ww = w.asInstanceOf[Long]
      if (!x.isNaN && ww > 0L) {
        val b = DecimalDDSketch.bucket(x)
        buffer.update(b, buffer.getOrElse(b, 0L) + ww)
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[Int, Long],
      b2: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  override def eval(buffer: mutable.HashMap[Int, Long]): Any = {
    val n = buffer.valuesIterator.sum
    if (n == 0L) {
      InternalRow(0L, null, null, null)
    } else {
      def q(p: Double) = DecimalDDSketch.quantileOf(buffer, n, p)
      InternalRow(n, q(0.50), q(0.95), q(0.99))
    }
  }

  override def serialize(buffer: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) => out.writeInt(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val m = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < size) { m.update(in.readInt(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalDDSketchW =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalDDSketchW =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DecimalDDSketchW =
    copy(child = newChildren(0), weight = newChildren(1))
}
