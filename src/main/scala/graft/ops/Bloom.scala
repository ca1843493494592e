package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType

/**
 * Bloom-filter prefilters for large-large anti joins — the "is this key
 * already in the 100 TB corpus?" shape where BOTH sides are too big to
 * broadcast and a plain anti join shuffles the full incoming batch.
 *
 * The sketch is built with Spark's own `BloomFilterAggregate` (the engine
 * uses it for runtime row-group filtering; it is not registered as a public
 * SQL function, so this exposes it through the same `private[sql]` bridge
 * as graft's native expressions). The filter is ONE-SIDED EXACT: a
 * `mightContain = false` row is *definitely* absent from the build side, so
 * for an anti join it can bypass the shuffle entirely; only the (rare)
 * `mightContain = true` candidates pay the exact equi-join that removes
 * Bloom false positives. Output is therefore exactly the plain anti join.
 *
 * Scale accounting at fpp p: the probe side splits into
 * `(1 - hitRate - p·missRate)` rows that never shuffle and
 * `(hitRate + p·missRate)` candidate rows that do — for a daily batch that
 * is mostly-new content, the anti-join shuffle shrinks by ~1/p. The sketch
 * itself is `-n·ln(p)/ln²2` bits (≈ 0.9 MB for 1 M keys at 1 %), built in
 * one map-side-combining aggregate over the build side and shipped to probe
 * tasks as a plan literal — the same bounded-driver-state class as the CoW
 * file-path probes (docs/SCALE.md). Probe rows are read twice (bypass +
 * candidate branches), both narrow scans; the trade is two cheap scans for
 * one large shuffle.
 */
object Bloom {

  /** Optimal bit count for `n` items at false-positive rate `p`, clamped to
    * Spark's runtime-filter ceiling (64 Mbit = 8 MB) so the literal stays a
    * bounded plan artifact. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    val bits = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    bits.max(64L).min(67108864L)
  }

  /**
   * Build a Bloom filter over `xxhash64(key)` for every row of `df` and
   * return its serialized form (null when `df` is empty). One aggregate
   * job; partial filters are OR-merged map-side.
   */
  /** Null-preserving key hash: `xxhash64(NULL)` returns the SEED (42), not
    * null, so hashing a null key directly would insert 42 into the filter
    * (and make any value hashing to 42 a false "maybe") — the aggregate
    * must instead SKIP null keys, which it does for a null input. */
  private def keyHash(key: Column): Column =
    when(key.isNull, lit(null).cast("long")).otherwise(xxhash64(key))

  def buildKeyFilter(df: DataFrame, key: Column,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      bridge.expression(keyHash(key)),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression()
    val row = df.agg(bridge.column(agg).as("__bloom")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Membership probe against a serialized filter from [[buildKeyFilter]]:
    * false ⇒ the key is definitely not in the build side; true ⇒ maybe.
    * A NULL probe key reads false (an equi-join never matches null), and
    * a null `filterBytes` (empty build side) means nothing is contained —
    * also false, never an NPE or a row-dropping null. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    if (filterBytes == null) lit(false)
    else coalesce(bridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      bridge.expression(keyHash(key)))), lit(false))

  /**
   * One Bloom filter PER GROUP per key column — the per-file manifest-stats
   * builder behind `write.metadata.bloom-filter.column.X` (GraftTable).
   * A single map-side-combining aggregate job: rows hash with `xxhash64`
   * (seed 42, Spark's SQL function) and OR into the group's bitset, so the
   * output is `groupCol` plus one nullable binary column per key (null when
   * the group had only null keys). The serialized form round-trips through
   * [[probeSerialized]] on the driver.
   */
  def buildGroupedFilters(df: DataFrame, groupCol: Column,
      keys: Seq[(String, Column)], expectedItems: Long,
      fpp: Double = 0.03): DataFrame = {
    require(keys.nonEmpty, "buildGroupedFilters needs at least one key column")
    val bits = optimalNumBits(expectedItems, fpp)
    val aggs = keys.map { case (name, key) =>
      bridge.column(new BloomFilterAggregate(
        bridge.expression(keyHash(key)),
        Literal(expectedItems), Literal(bits)).toAggregateExpression())
        .as(name)
    }
    df.groupBy(groupCol.as("__group"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Driver-side `xxhash64(string)` — bit-identical to the SQL function the
    * build side hashes with (seed 42 over UTF-8 bytes), so a driver probe
    * against a task-built filter is sound. */
  def hashString(v: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]

  /** Driver-side membership probe on a serialized filter: false ⇒ the value
    * was definitely never inserted; true ⇒ maybe (fpp-bounded). A null
    * filter (empty build side, [[buildKeyFilter]]'s documented return)
    * contains nothing. */
  def probeSerialized(filterBytes: Array[Byte], hash: Long): Boolean =
    filterBytes != null &&
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(filterBytes))
        .mightContainLong(hash)

  /**
   * Exact `left LEFT ANTI JOIN right ON left(leftKey) = right(rightKey)`
   * with a Bloom bypass: definitely-absent left rows skip the join, only
   * `mightContain` candidates are joined (removing false positives).
   *
   * `left` is scanned twice (definitely-absent branch + candidate branch);
   * it must be deterministic across the two scans, or a row could land in
   * both or neither branch. Cache a non-deterministic source first.
   *
   * @param expectedItems build-side distinct-key estimate for sizing; a low
   *                      estimate degrades fpp (more candidates, still
   *                      exact), never correctness
   */
  def antiJoinKeys(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(!left.columns.contains("__rk"),
      "left side already has a column named __rk (reserved by antiJoinKeys)")
    val filter = buildKeyFilter(right, col(rightKey), expectedItems, fpp)
    if (filter == null) return left // empty build side: anti join keeps all
    val maybe = mightContain(filter, col(leftKey))
    val rightKeys = right.select(col(rightKey).as("__rk")).distinct()
    val candidates = left.filter(maybe)
      .join(rightKeys, col(leftKey) === col("__rk"), "left_anti")
    left.filter(!maybe).unionByName(candidates)
  }
}
