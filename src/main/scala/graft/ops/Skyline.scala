package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

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
 * Scale shape — the classic two-phase prune:
 *   1. **Local phase** (narrow, no shuffle): each input partition computes
 *      its own skyline with one sort + one linear scan in
 *      `mapPartitions`. A partition's skyline is a superset filter for the
 *      global one (any globally non-dominated point is locally
 *      non-dominated), and for non-degenerate data it is tiny —
 *      O(log n) expected points per partition under independent axes —
 *      so phase 1 discards essentially the whole table executor-side.
 *   2. **Global phase**: the surviving candidates (hundreds, not
 *      billions) are pulled into ONE task (`repartition(1)`) and pruned
 *      with the same scan. The single task is safe precisely because
 *      phase 1 bounds its input to the union of per-partition skylines —
 *      the one-reducer stage sees O(parts · skyline), never O(n). The
 *      full table is never shuffled, collected, or globally sorted.
 *
 * The scan itself: sort (x desc, y desc), walk x-groups in order; a group
 * survives iff its max-y beats the running max-y of all strictly-greater-x
 * groups (equal y there means a higher-x dominator exists), and within the
 * group only max-y rows survive (same x, higher y dominates). Integer
 * (bigint) axes only — float rounding belongs upstream. The full Long
 * range is supported (no negation or sentinel tricks).
 */
object Skyline {

  /** Rows of `df` not dominated on (`xCol`, `yCol`), both maximized.
    * All other columns ride along unchanged. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val xi = df.schema.fieldIndex(xCol)
    val yi = df.schema.fieldIndex(yCol)
    Seq(xi, yi).foreach { i =>
      require(df.schema(i).dataType == org.apache.spark.sql.types.LongType,
        s"skyline axes must be bigint (exact ordering); " +
          s"${df.schema(i).name} is ${df.schema(i).dataType.simpleString} — cast upstream")
    }
    val prune = (rows: Iterator[Row]) => localSkyline(rows, xi, yi)
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    val local = df.mapPartitions(prune)(enc)
    // phase-1 output is small by construction; one task finishes the job
    local.repartition(1).mapPartitions(prune)(enc)
  }

  /** One sort + linear scan skyline over an in-memory partition. Rows
    * with a null axis pass through unpruned (SQL dominance semantics:
    * they neither dominate nor are dominated). */
  private def localSkyline(rows: Iterator[Row], xi: Int, yi: Int): Iterator[Row] = {
    val (nullAxis, valued) = rows.toArray.partition(r => r.isNullAt(xi) || r.isNullAt(yi))
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
