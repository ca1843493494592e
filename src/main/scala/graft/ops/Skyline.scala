package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed 2-D skyline (Pareto frontier, maximize both axes) — the
 * multi-criteria "best tradeoff" operator (Börzsönyi / Kossmann / Stocker,
 * "The Skyline Operator", ICDE 2001 — public literature). A row survives
 * iff no other row dominates it: `q` dominates `p` iff `q.x >= p.x` and
 * `q.y >= p.y` with at least one strict. Ties on BOTH axes are
 * non-dominating, so exact duplicates all survive. Rows with a NULL axis
 * follow SQL three-valued logic exactly as the `NOT EXISTS` dominance
 * query would treat them: every comparison against them is unknown, so
 * they never dominate anything and are never dominated — they pass
 * through to the output untouched.
 *
 * Scale shape — partition prune, then a GRID-PARTITIONED finish (no
 * single-task phase anywhere, even for adversarial inputs):
 *   1. **Local phase** (narrow, no shuffle): each input partition computes
 *      its own skyline with one sort + one linear scan in
 *      `mapPartitions`. A partition's skyline is a superset filter for the
 *      global one (any globally non-dominated point is locally
 *      non-dominated) — for independent axes it discards essentially the
 *      whole table executor-side. The candidate set is cached
 *      (MEMORY_AND_DISK) because the finish reads it three times (cut
 *      points, per-bucket maxima, the filter itself) — one input scan
 *      total, never three.
 *   2. **Grid prefilter** (declarative, all lazy): `buckets-1` approximate
 *      percentiles of candidate `x` define x-ordered buckets
 *      (`__b` = #cuts strictly above x, so equal x always share a bucket
 *      and every row in a LOWER bucket has STRICTLY greater x). Per-bucket
 *      `max(y)` rolls into a running prefix max over higher-x buckets
 *      (a ≤`buckets`-row window), broadcast back: a candidate whose y
 *      does not beat the prefix max of its bucket is dominated by some
 *      higher-x candidate and is dropped without any pairwise work. This
 *      is exact, not approximate — the percentile sketch only steers
 *      bucket SIZES, never correctness.
 *   3. **Per-bucket finish**: survivors hash-partition by bucket and each
 *      task scans only its buckets. Any remaining dominator of a
 *      surviving row provably shares its bucket (a dropped same-bucket
 *      dominator would imply a prefix max that drops the row too), so
 *      per-bucket pruning IS the global skyline. Worst case — fully
 *      anti-correlated axes where NOTHING is dominated — each task
 *      materializes O(candidates / buckets), never O(candidates); the
 *      old `repartition(1)` finish would have funneled the whole
 *      candidate union (≈ the whole table, for such inputs) through one
 *      task. The unavoidable residual skew: a single x value with
 *      millions of ties must share a bucket (its y-ties resolve there).
 *
 * The scan itself: sort (x desc, y desc), walk x-groups in order; a group
 * survives iff its max-y beats the running max-y of all strictly-greater-x
 * groups (equal y there means a higher-x dominator exists), and within the
 * group only max-y rows survive (same x, higher y dominates). Integer
 * (bigint) axes only — float rounding belongs upstream. The full Long
 * range is supported (no negation or sentinel tricks).
 */
object Skyline {

  /** Local-mode test probe: when set >= 0, every local scan records the
    * largest row count any single task materialized (shared-JVM
    * instrumentation for `local[n]` specs; executors on a real cluster
    * simply never see a non-negative value). */
  private[ops] val probeMaxTaskRows =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Rows of `df` not dominated on (`xCol`, `yCol`), both maximized.
    * All other columns ride along unchanged. `buckets` bounds the finish:
    * no task materializes more than ~candidates/buckets rows. The default
    * (`spark.sql.shuffle.partitions`, min 2) tracks the session's tuned
    * parallelism — on a 1000-executor cluster that is thousands of
    * buckets, while local runs avoid paying hundreds of near-empty
    * finish tasks; raise it explicitly if the FRONTIER itself may exceed
    * parallelism × task memory. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 0): DataFrame = {
    val nBuckets =
      if (buckets > 0) buckets
      else math.max(2, df.sparkSession.sessionState.conf.numShufflePartitions)
    require(nBuckets >= 2, s"buckets must be >= 2, got $nBuckets")
    val xi = df.schema.fieldIndex(xCol)
    val yi = df.schema.fieldIndex(yCol)
    Seq(xi, yi).foreach { i =>
      require(df.schema(i).dataType == org.apache.spark.sql.types.LongType,
        s"skyline axes must be bigint (exact ordering); " +
          s"${df.schema(i).name} is ${df.schema(i).dataType.simpleString} — cast upstream")
    }
    val prune = (rows: Iterator[Row]) => localSkyline(rows, xi, yi)
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    // phase 1: narrow per-partition prune, cached at the RDD level because
    // the grid finish consumes it three times (cuts, bucket maxima, the
    // filter itself). RDD persist — NOT Dataset.persist — on purpose: the
    // ContextCleaner unpersists an RDD cache automatically once the result
    // plan is garbage-collected, whereas CacheManager entries from
    // Dataset.persist would accumulate across calls until an explicit
    // unpersist this lazy-returning operator has no place to issue.
    val candRdd = df.mapPartitions(prune)(enc).rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = df.sparkSession.createDataFrame(candRdd, df.schema)

    val x = col(xCol)
    val y = col(yCol)
    val valued = x.isNotNull && y.isNotNull

    // x-ordered bucket cut points (deterministic sketch — recompute-safe)
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val cuts = cand.filter(valued)
      .agg(expr(s"approx_percentile(`$xCol`, array(${probs.mkString(",")}))")
        .as("__cuts"))
    // bucket 0 = highest x range; equal x can never straddle a bucket
    val bucketed = cand.crossJoin(broadcast(cuts))
      .withColumn("__b",
        when(valued, size(filter(col("__cuts"), c => c > x))).cast("int"))
      .drop("__cuts")

    // exact per-bucket max(y) → running prefix max over strictly-higher-x
    // buckets. The prefix runs as a tiny triangle self-join over the
    // ≤ `buckets`-row aggregate (broadcast, no window, no single-partition
    // stage): prefix(b) = max over buckets b' < b of their max y.
    val bm = bucketed.filter(col("__b").isNotNull)
      .groupBy(col("__b")).agg(max(y).as("__bmax"))
    val prefix = bm.select(col("__b"), col("__bmax"))
      .join(broadcast(bm.select(col("__b").as("__rb"), col("__bmax").as("__rmax"))),
        col("__rb") < col("__b"), "left")
      .groupBy(col("__b")).agg(max(col("__rmax")).as("__pmax"))

    // drop rows beaten by a strictly-higher-x bucket's max y; null-axis
    // rows (__b null → no join match) and the top bucket (__pmax null)
    // pass through untouched
    val kept = bucketed.join(broadcast(prefix), Seq("__b"), "left")
      .filter(col("__pmax").isNull || y > col("__pmax"))
      .drop("__pmax")

    // per-bucket finish: all surviving dominators of a row share its
    // bucket, so bucket-partitioned local scans yield the global skyline
    val outSchema = kept.schema
    val bxi = outSchema.fieldIndex(xCol)
    val byi = outSchema.fieldIndex(yCol)
    val encB = org.apache.spark.sql.Encoders.row(outSchema)
    val pruneB = (rows: Iterator[Row]) => localSkyline(rows, bxi, byi)
    kept.repartition(nBuckets, col("__b"))
      .mapPartitions(pruneB)(encB)
      .drop("__b")
  }

  /** One sort + linear scan skyline over an in-memory partition. Rows
    * with a null axis pass through unpruned (SQL dominance semantics:
    * they neither dominate nor are dominated). */
  private def localSkyline(rows: Iterator[Row], xi: Int, yi: Int): Iterator[Row] = {
    val (nullAxis, valued) = rows.toArray.partition(r => r.isNullAt(xi) || r.isNullAt(yi))
    if (probeMaxTaskRows.get() >= 0L) {
      val n = (nullAxis.length + valued.length).toLong
      probeMaxTaskRows.getAndAccumulate(n, math.max)
    }
    if (valued.isEmpty) return nullAxis.iterator
    // descending on both axes WITHOUT negation: -Long.MinValue overflows
    val desc = Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long.reverse)
    val sorted = valued.sortBy(r => (r.getLong(xi), r.getLong(yi)))(desc)
    val out = Array.newBuilder[Row]
    var i = 0
    var haveBest = false // "no strictly-greater-x group seen yet" flag, not a sentinel value
    var bestY = 0L       // max y among strictly-greater-x groups (valid iff haveBest)
    while (i < sorted.length) {
      val x = sorted(i).getLong(xi)
      val groupMaxY = sorted(i).getLong(yi) // sorted y desc within group
      val groupWins = !haveBest || groupMaxY > bestY
      var j = i
      while (j < sorted.length && sorted(j).getLong(xi) == x) {
        if (groupWins && sorted(j).getLong(yi) == groupMaxY)
          out += sorted(j)
        j += 1
      }
      if (!haveBest || groupMaxY > bestY) { bestY = groupMaxY; haveBest = true }
      i = j
    }
    out.result().iterator ++ nullAxis.iterator
  }
}
