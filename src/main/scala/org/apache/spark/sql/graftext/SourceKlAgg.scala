package org.apache.spark.sql.graftext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-group KL(group ‖ reference) over the 1024 DSIR hashed-gram
  * buckets as a Catalyst [[TypedImperativeAggregate]] — the single-pass
  * form of the batch `t_source_kl` term sum, for groups a streaming
  * query cannot re-aggregate (chained stateful aggregations are illegal:
  * the windowed dual needs per-(window, source) bucket counts AND the
  * cross-bucket sum in ONE stateful stage).
  *
  * The buffer is the group's exact bucket histogram (1024 longs, 8 KiB —
  * constant per group, mergeable by element-wise add, so partial
  * aggregation collapses map-side like any sketch). `eval` replays the
  * batch query's exact term discipline over the FULL 1024-bucket domain:
  * add-1 smoothing on both sides, each bucket's term rounded to integer
  * MICRO-nats (BigDecimal HALF_UP — what SQL `round(x, 0)` computes on
  * both engines, the dsir-default lesson) BEFORE the sum, reference
  * counts `nb`/`nn` from the offline calibration as literals. Output:
  * struct<n_grams, kl_micro> — the derived `kl` double is the caller's
  * same-expression projection, exactly as in the batch query.
  *
  * Merge-order-invariant by construction (histogram add is commutative;
  * rounding happens only in eval), so batch == stream on identical
  * groups — SourceKlStreamSpec pins it against the oracle-checked twin.
  */
case class SourceKlAgg(
    bucket: Expression,
    nbExpr: Expression,
    nnExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(bucket, nbExpr, nnExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, ArrayType(LongType), LongType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_source_kl"

  @transient private lazy val nb: Array[Long] = {
    require(nbExpr.foldable, s"$prettyName: reference bucket counts must be a literal")
    val v = nbExpr.eval(InternalRow.empty)
    require(v != null, s"$prettyName: reference bucket counts must not be null")
    val arr = v.asInstanceOf[ArrayData].toLongArray()
    require(arr.length == 1024,
      s"$prettyName: reference must cover all 1024 buckets, got ${arr.length}")
    arr
  }

  @transient private lazy val nn: Long = {
    require(nnExpr.foldable, s"$prettyName: reference total must be a literal")
    val v = nnExpr.eval(InternalRow.empty)
    require(v != null, s"$prettyName: reference total must not be null")
    v.asInstanceOf[Long]
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("kl_micro", LongType, nullable = false)))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1024)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val bv = bucket.eval(input)
    if (bv != null) {
      val b = bv.asInstanceOf[Int]
      require(b >= 0 && b < 1024, s"$prettyName: bucket $b out of [0, 1024)")
      buffer(b) += 1
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 1024) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var ns = 0L
    var i = 0
    while (i < 1024) { ns += buffer(i); i += 1 }
    // the batch term, verbatim: ((c+1)/(ns+1024)) * (ln(c+1) − ln(ns+1024)
    // − ln(nb+1) + ln(nn+1024)) in micro-nats, HALF_UP per bucket
    var klMicro = 0L
    var b = 0
    while (b < 1024) {
      val c = buffer(b)
      val term = ((c + 1).toDouble / (ns + 1024)) *
        (math.log((c + 1).toDouble) - math.log((ns + 1024).toDouble) -
          math.log((nb(b) + 1).toDouble) + math.log((nn + 1024).toDouble)) * 1000000e0
      klMicro += BigDecimal(term).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      b += 1
    }
    InternalRow(ns, klMicro)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8192)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < 1024) { out.writeLong(buffer(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](1024)
    var i = 0
    while (i < 1024) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SourceKlAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SourceKlAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SourceKlAgg =
    copy(bucket = newChildren(0), nbExpr = newChildren(1), nnExpr = newChildren(2))
}
