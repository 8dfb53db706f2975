package org.apache.spark.sql.graftext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-k as a Catalyst [[TypedImperativeAggregate]]:
  * keep the k strongest (score DESC, id ASC on ties) of the group's
  * (score, id) rows in a bounded k-entry heap. The buffer never exceeds
  * k entries, so partial aggregation collapses each map task to ≤ k
  * rows BEFORE the shuffle — per-group top-k costs one exchange of
  * k-sized states instead of a rank window's full per-group sort: the
  * shape that survives a group holding 10^8 distinct ids. Merge is
  * heap-union under the same cap; because "top k by a total order" is a
  * pure function of the input multiset, the result is
  * MERGE-ORDER-INVARIANT (same selection no matter how rows split
  * across partials), which is what lets a plain SQL rank oracle match
  * it exactly.
  *
  * Contract: ids are expected unique within a group (feed it
  * pre-aggregated (key → score) cells, not raw rows — duplicate ids
  * would rank as independent entries). Output:
  * array<struct<id, score, rnk>> in rank order, rnk 1-based.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, IntegerType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  @transient private lazy val k: Int = {
    require(kExpr.foldable, s"$prettyName: k must be an integer literal")
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, s"$prettyName: k must not be null")
    val kk = v.asInstanceOf[Int]
    require(kk >= 1 && kk <= 65536, s"$prettyName: k must be in [1, 65536], got $kk")
    kk
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", LongType, nullable = false),
    StructField("rnk", LongType, nullable = false))), containsNull = false)

  // Root of the queue = the WEAKEST kept entry (smallest score, then
  // largest id), so a cap-replace keeps the strongest k. Scala's
  // PriorityQueue is a max-heap, so "weaker" must compare GREATER.
  // Built from explicit Long.compare (no negation: -Long.MinValue
  // overflows back to Long.MinValue and would rank the weakest
  // possible score as strongest).
  private def weakestFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // lower score = weaker = greater
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id = weaker = greater
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](weakestFirst)

  /** Is (s, i) strictly stronger than (ws, wi) under (score DESC, id ASC)? */
  private def stronger(s: Long, i: Long, ws: Long, wi: Long): Boolean =
    s > ws || (s == ws && i < wi)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)], s: Long, i: Long): Unit =
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (stronger(s, i, ws, wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }

  override def update(
      buffer: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      offer(buffer, sv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buffer
  }

  override def merge(
      b1: mutable.PriorityQueue[(Long, Long)],
      b2: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach { case (s, i) => offer(b1, s, i) }
    b1
  }

  override def eval(buffer: mutable.PriorityQueue[(Long, Long)]): Any = {
    // ascending under weakestFirst = strongest first (same no-negation rule)
    val ranked = buffer.toArray.sorted(weakestFirst)
    new GenericArrayData(ranked.zipWithIndex.map { case ((s, i), r) =>
      InternalRow(i, s, (r + 1).toLong)
    })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (s, i) => out.writeLong(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < size) { buf.enqueue((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
