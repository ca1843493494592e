package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst AGGREGATE expressions — the summary-sketch class the
 * scalar expressions in [[expressions.scala]] can't cover.
 *
 * [[MisraGries]] is the classic deterministic heavy-hitters summary
 * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
 * summaries", PODS 2012 — both public literature): a bounded map of at
 * most `k` (item, weight) entries. Update: hit increments; miss inserts
 * while below capacity, otherwise decrements every entry (dropping
 * zeros) — each decrement "pays" with k+1 distinct occurrences, giving
 * the guarantee `true_count - n/(k+1) <= est <= true_count`. Merge: add
 * the two maps, then subtract the (k+1)-th largest weight from every
 * entry and drop non-positives — the summary stays k-bounded and keeps
 * the same error bound over the merged stream, which is exactly what
 * makes it safe as a map-side partial aggregate: each task summarizes
 * its partition in O(k) memory and only k-entry summaries ride the
 * shuffle, never per-item counts.
 *
 * ANY item with true frequency > n/(k+1) is guaranteed present in the
 * final summary (its estimate stays positive). Estimates themselves
 * depend on arrival/merge order, so the deterministic-output pattern is
 * the standard two-pass one ([[graft.ops.HeavyHitters]]): MG for the
 * guaranteed-complete candidate set, one exact count over just those
 * candidates.
 */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, s"misra_gries requires k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // array<struct<item,est>> sorted (est desc, item asc): deterministic
  // GIVEN a buffer, and explode-friendly for the candidate join
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k =>
        // clone: the incoming UTF8String may point into a reused row buffer
        buf.update(item.clone(), 1L)
      case None =>
        // decrement-all, dropping zeros: k+1 distinct items each pay one
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      buf.updateWith(item)(prev => Some(prev.getOrElse(0L) + c))
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest weight from everything; at most k
      // entries stay strictly positive
      val kth = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      buf.mapValuesInPlace((_, c) => c - kth)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c) }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

/**
 * One-pass mergeable Gram-matrix accumulator over a vector column:
 * `G = Σ v·vᵀ`, kept as the upper triangle (row-major, `d*(d+1)/2`
 * doubles). This is THE distributed-linear-algebra primitive behind PCA /
 * covariance / whitening: each task folds its partition into one O(d²)
 * buffer, partial buffers merge by elementwise add (exact — float
 * products accumulate in doubles), and only O(d²) doubles ever ride the
 * shuffle — never a per-row d² explosion, which at N rows would shuffle
 * N·d² cells. Output is an array of (i, j, gram) structs for the upper
 * triangle, explode-friendly.
 *
 * Null vectors are skipped (contract mirrors SQL `sum`); a non-null
 * vector with the wrong length or a null element fails loudly — silently
 * zero-filling would corrupt the matrix.
 */
case class GramMatrix(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1, s"gram_matrix requires dim >= 1, got $dim")
  private val triLen = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType), StructField("j", IntegerType),
    StructField("gram", DoubleType))))

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix requires array<float|double>, got ${child.dataType}")
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](triLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"gram_matrix(dim=$dim) fed a length-${arr.numElements()} vector")
    val vec = new Array[Double](dim)
    val isFloat = elemType == FloatType
    var i = 0
    while (i < dim) {
      require(!arr.isNullAt(i), s"gram_matrix: null element at index $i")
      vec(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var k = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        buf(k) += vec(i) * vec(j)
        j += 1; k += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var k = 0
    while (k < triLen) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val out = new Array[Any](triLen)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(k) = InternalRow(i, j, buf(k))
        j += 1; k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bytes = new Array[Byte](triLen * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var k = 0
    while (k < triLen) { bb.putDouble(buf(k)); k += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Double](triLen)
    var k = 0
    while (k < triLen) { buf(k) = bb.getDouble(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrix =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrix =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
  override def prettyName: String = "gram_matrix"
}

object GraftAggregates {
  /** Upper-triangle Gram matrix Σ v·vᵀ of a vector column as one
    * array<struct<i,j,gram>> value — O(d²) state per task, O(d²) bytes on
    * the shuffle, exact double accumulation. */
  def gram_matrix(c: Column, dim: Int): Column =
    bridge.column(GramMatrix(bridge.expression(c), dim).toAggregateExpression())

  /** Misra-Gries heavy-hitters summary of a string column: at most `k`
    * (item, est) entries; any item with frequency > n/(k+1) is guaranteed
    * present. Estimates are order-dependent — pair with an exact second
    * pass for deterministic output ([[graft.ops.HeavyHitters]]). */
  def misra_gries(c: Column, k: Int): Column =
    bridge.column(MisraGries(bridge.expression(c), k).toAggregateExpression())
}
