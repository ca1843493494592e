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

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005 — public literature): a
 * `depth × width` grid of counters; each item increments one counter per
 * row, chosen by an independent hash, and a point estimate is the MINIMUM
 * over its `depth` counters — always ≥ the true count, and ≤ true +
 * O(n/width) with probability `1 - 2^-depth` per probe. Unlike Misra-Gries
 * the state is pure sums, so the final sketch is bit-identical under ANY
 * partitioning/merge order — fully deterministic for a fixed input set.
 *
 * Row hash for depth `d`: `xxhash64(item-bytes ++ byte(d+1))` with SQL's
 * seed 42 — reproducible from SQL as `xxhash64(concat(item, chr(d+1)))`,
 * which is what lets [[graft.ops.Sketch.cmsEstimates]] probe the sketch
 * in a distributed codegen'd expression rather than a UDF.
 *
 * Scale shape: O(depth·width) fixed memory per task, map-side partials,
 * only sketch grids (64 KB at 4×2048) ride the shuffle — never per-item
 * counts. Output: array<long> of length depth·width (row-major).
 */
case class CountMin(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"count_min depth must be in [1,16], got $depth")
  require(width >= 2, s"count_min width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min requires a string column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].getBytes
    var d = 0
    while (d < depth) {
      buf(d * width + CountMin.bucket(item, d, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMin =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMin =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren.head)
  override def prettyName: String = "count_min"
}

object CountMin {
  /** Bucket of `item` at depth row `d`: xxhash64 (SQL seed 42) of the
    * UTF-8 bytes suffixed with the single byte `d+1`, mod width. Matches
    * `pmod(xxhash64(concat(item, chr(d+1))), width)` in SQL exactly. */
  def bucket(itemUtf8: Array[Byte], d: Int, width: Int): Int = {
    val bytes = java.util.Arrays.copyOf(itemUtf8, itemUtf8.length + 1)
    bytes(itemUtf8.length) = (d + 1).toByte
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)
    (((h % width) + width) % width).toInt
  }
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

  /** Count-min sketch of a string column: depth×width counter grid as one
    * array<long> value. Pure sums — the sketch is bit-identical under any
    * partitioning. Probe with [[graft.ops.Sketch.cmsEstimates]]. */
  def count_min(c: Column, depth: Int, width: Int): Column =
    bridge.column(CountMin(bridge.expression(c), depth, width)
      .toAggregateExpression())
}
