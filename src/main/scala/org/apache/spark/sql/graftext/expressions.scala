package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}

import graft.functions.TextHashUtil

/** Native Catalyst expressions for the graft text-hash kernels. Located
  * under org.apache.spark.sql because ExpectsInputTypes/AbstractDataType
  * and the Column<->Expression bridge are private[sql]. Logic lives in
  * [[graft.functions.TextHashUtil]]; these classes only bind it into
  * whole-stage codegen (doGenCode emits a single static call).
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], prime: Long)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.minhashSig(input.asInstanceOf[ArrayData], aArr, bArr, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.minhashSig($c, $aRef, $bRef, ${prime}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class SimHash32(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

case class MediaAHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_media_ahash"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.mediaAHash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.mediaAHash($c);")

  override protected def withNewChildInternal(newChild: Expression): MediaAHash =
    copy(child = newChild)
}

case class TrigramHashes(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_trigram_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.trigramHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.trigramHashes($c);")

  override protected def withNewChildInternal(newChild: Expression): TrigramHashes =
    copy(child = newChild)
}

/** Sorted distinct 60-bit md5 hashes of the n-token shingles of `child`
  * — [[TrigramHashes]] at any gram width; `n` is a plan-time constant
  * (13 for benchmark decontamination), so codegen inlines it. */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.ngramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.ngramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Position-ordered 48-bit hashes of the n-token shingles of `child` —
  * element i is the window toks(i..i+n-1); neither sorted nor distinct,
  * for span-level operators that need gram locations. */
case class NgramHashesPos(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes_pos"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.ngramHashesPos(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.ngramHashesPos($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesPos =
    copy(child = newChild)
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any =
    TextHashUtil.sortedIntersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.TextHashUtil.sortedIntersectCount($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

case class Md5Hash48(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_hash48"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.hash48(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.hash48($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash48 =
    copy(child = newChild)
}

/** DSIR feature buckets (unigram + space-joined-bigram hash32 % 1024)
  * of a token array — see TextHashUtil.dsirBuckets. */
case class DsirBuckets(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_dsir_buckets"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.dsirBuckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.dsirBuckets($c);")

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

/** The DSIR apply fold: sum of the plan-time lam model over the token
  * array's feature buckets, as one codegen'd static call — the HOF
  * lambda formulation ran interpreted per gram. */
case class DsirFoldMicro(child: Expression, lam: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val lamArr: Array[Long] = lam.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dsir_fold"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.dsirFoldMicro(input.asInstanceOf[ArrayData], lamArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lamRef = ctx.addReferenceObj("dsirLam", lamArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.dsirFoldMicro($c, $lamRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirFoldMicro =
    copy(child = newChild)
}

object columns {
  def minhashSig(tokens: Column, a: Seq[Long], b: Seq[Long], prime: Long): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(tokens), a, b, prime))

  def simhash32(tokens: Column): Column =
    ExpressionUtils.column(SimHash32(ExpressionUtils.expression(tokens)))

  def trigramHashes(tokens: Column): Column =
    ExpressionUtils.column(TrigramHashes(ExpressionUtils.expression(tokens)))

  def mediaAHash(s: Column): Column =
    ExpressionUtils.column(MediaAHash(ExpressionUtils.expression(s)))

  def ngramHashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashes(ExpressionUtils.expression(tokens), n))

  def ngramHashesPos(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashesPos(ExpressionUtils.expression(tokens), n))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def md5Hash48(s: Column): Column =
    ExpressionUtils.column(Md5Hash48(ExpressionUtils.expression(s)))

  def dsirBuckets(tokens: Column): Column =
    ExpressionUtils.column(DsirBuckets(ExpressionUtils.expression(tokens)))

  def dsirFoldMicro(tokens: Column, lam: Seq[Long]): Column =
    ExpressionUtils.column(DsirFoldMicro(ExpressionUtils.expression(tokens), lam))

  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vecL2Sq(a: Column, b: Column): Column =
    ExpressionUtils.column(VecL2Sq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def ddSketch(c: Column): Column =
    ExpressionUtils.column(
      DecimalDDSketch(ExpressionUtils.expression(c)).toAggregateExpression())

  def ddSketchQ(c: Column, qs: Seq[Double]): Column =
    ExpressionUtils.column(
      DecimalDDSketchQ(ExpressionUtils.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          qs.toArray, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))).toAggregateExpression())

  def ddSketchW(c: Column, w: Column): Column =
    ExpressionUtils.column(
      DecimalDDSketchW(ExpressionUtils.expression(c),
        ExpressionUtils.expression(w)).toAggregateExpression())

  def topK(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score), ExpressionUtils.expression(id),
        org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())

  def sourceKl(bucket: Column, nb: Seq[Long], nn: Long): Column =
    ExpressionUtils.column(
      SourceKlAgg(ExpressionUtils.expression(bucket),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          nb.toArray, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal(nn))
        .toAggregateExpression())

  def bucketOf(v: Column, boundaries: Seq[Double]): Column =
    ExpressionUtils.column(BucketOf(ExpressionUtils.expression(v), boundaries))

  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(LshBucket(ExpressionUtils.expression(v), planes))

  def signPack(v: Column, off: Int): Column =
    ExpressionUtils.column(SignPack(ExpressionUtils.expression(v), off))

  def pqCodes(v: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(v), cb))

  def pqAdcScaled(q: Column, codes: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqAdcScaled(
      ExpressionUtils.expression(q), ExpressionUtils.expression(codes), cb))

  def intDotLong(a: Column, b: Column): Column =
    ExpressionUtils.column(IntDotLong(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def pqAssignRounded(v: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqAssignRounded(ExpressionUtils.expression(v), cb))

  def coarseAssignTop1(v: Column, nrm: Column,
      ces: Seq[Seq[Double]], cns: Seq[Double]): Column =
    ExpressionUtils.column(CoarseAssignTop1(
      ExpressionUtils.expression(v), ExpressionUtils.expression(nrm), ces, cns))
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType),
      ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.VectorUtil.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.VectorUtil.dot($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

case class IntDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.VectorUtil.dotIntLong(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.VectorUtil.dotIntLong($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDotLong =
    copy(left = newLeft, right = newRight)
}

case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType),
      ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_vec_l2sq"

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.VectorUtil.l2sq(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.VectorUtil.l2sq($l, $r);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** PQ encode: argmin centroid per subspace, packed 4 bits per code.
  * The codebook is a plan-time constant (training-free, 16 centroids
  * per subspace) referenced once from generated code. */
case class PqCodes(child: Expression, cb: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(input: Any): Any =
    graft.functions.VectorUtil.pqCodes(input.asInstanceOf[ArrayData], cbArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorUtil.pqCodes($c, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Lloyd-assignment PQ encode: argmin per subspace over the 6dp-ROUNDED
  * distance with smallest-index tiebreak — the training trajectory's
  * exact pin as one codegen'd scan (see VectorUtil.pqAssignRounded). */
case class PqAssignRounded(child: Expression, cb: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_assign"

  override def nullSafeEval(input: Any): Any =
    graft.functions.VectorUtil.pqAssignRounded(input.asInstanceOf[ArrayData], cbArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorUtil.pqAssignRounded($c, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignRounded =
    copy(child = newChild)
}

/** Coarse-cell top-1 assignment: position of the centroid with the
  * largest 6dp-rounded cosine, ties to the smallest cid — ivfAssign's
  * maxRank=1 trajectory as one codegen'd scan over the bounded
  * plan-time centroid model (see VectorUtil.coarseAssignTop1). */
case class CoarseAssignTop1(left: Expression, right: Expression,
    ces: Seq[Seq[Double]], cns: Seq[Double])
    extends BinaryExpression with ExpectsInputTypes {

  @transient private lazy val ceArr: Array[Array[Double]] =
    ces.map(_.toArray).toArray
  @transient private lazy val cnArr: Array[Double] = cns.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_coarse_assign1"

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.VectorUtil.coarseAssignTop1(
      l.asInstanceOf[ArrayData], r.asInstanceOf[Double], ceArr, cnArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ceRef = ctx.addReferenceObj("coarseCents", ceArr, "double[][]")
    val cnRef = ctx.addReferenceObj("coarseNorms", cnArr, "double[]")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.VectorUtil.coarseAssignTop1($l, $r, $ceRef, $cnRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CoarseAssignTop1 =
    copy(left = newLeft, right = newRight)
}

/** ADC distance of a query vector against packed PQ codes, as an exact
  * integer micro-distance (see VectorUtil.pqAdcScaled). */
case class PqAdcScaled(left: Expression, right: Expression, cb: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with ExpectsInputTypes {

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType), IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.VectorUtil.pqAdcScaled(
      l.asInstanceOf[ArrayData], r.asInstanceOf[Int], cbArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.VectorUtil.pqAdcScaled($l, $r, $cbRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScaled =
    copy(left = newLeft, right = newRight)
}

/** Equi-depth bucket id: #{b in sorted quantile boundaries : b <= v} via
  * binary upper-bound. The boundary array is a plan-time constant (one
  * bounded approxQuantile pass), referenced once from generated code —
  * replaces the interpreted aggregate-over-literal-array HOF count in
  * the equi-depth Z-order writer's per-row hot path. */
case class BucketOf(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val boundArr: Array[Double] = boundaries.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bucket_of"

  override def nullSafeEval(input: Any): Any =
    graft.functions.VectorUtil.upperBound(boundArr, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bucketBounds", boundArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorUtil.upperBound($bRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketOf =
    copy(child = newChild)
}

/** Sign-bit half-word pack (see VectorUtil.signPack): bit j of the
  * result is set iff element off+j of the double array is > 0; `off` is
  * a plan-time constant (0 or 32 for the 64-dim fixtures), so codegen
  * inlines it. Replaces the 32-step interpreted `aggregate(sequence())`
  * HOF lambda in e_knn_hamming's corpus pack pass — the operator's
  * whole pitch is "cheapest prefilter at 100 TB", so its one full-corpus
  * stage must ride whole-stage codegen like the rest of VectorUtil. */
case class SignPack(child: Expression, off: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_pack"

  override def nullSafeEval(input: Any): Any =
    graft.functions.VectorUtil.signPack(input.asInstanceOf[ArrayData], off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorUtil.signPack($c, $off);")

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

case class LshBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    graft.functions.VectorUtil.lshBucket(input.asInstanceOf[ArrayData], planeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorUtil.lshBucket($c, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}
