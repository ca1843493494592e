package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Distributed 2-D skyline (Pareto frontier, maximize both axes) — the
 * multi-criteria "best tradeoff" operator (Börzsönyi / Kossmann / Stocker,
 * "The Skyline Operator", ICDE 2001 — public literature). A row survives
 * iff no other row dominates it: `q` dominates `p` iff `q.x >= p.x` and
 * `q.y >= p.y` with at least one strict. Ties on BOTH axes are
 * non-dominating, so exact duplicates all survive — matching the
 * `NOT EXISTS` dominance SQL the oracle runs.
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
 * group only max-y rows survive (same x, higher y dominates). Integer or
 * otherwise exactly-ordered axes only — float rounding belongs upstream.
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

  /** One sort + linear scan skyline over an in-memory partition. Null
    * axes never dominate and are never kept (SQL comparison semantics:
    * a null axis can't win a `NOT EXISTS` dominance check either). */
  private def localSkyline(rows: Iterator[Row], xi: Int, yi: Int): Iterator[Row] = {
    val pts = rows.filter(r => !r.isNullAt(xi) && !r.isNullAt(yi)).toArray
    if (pts.isEmpty) return Iterator.empty
    val sorted = pts.sortBy(r => (-r.getLong(xi), -r.getLong(yi)))
    val out = Array.newBuilder[Row]
    var i = 0
    var bestY = Long.MinValue // max y among strictly-greater-x groups
    while (i < sorted.length) {
      val x = sorted(i).getLong(xi)
      val groupMaxY = sorted(i).getLong(yi) // sorted y desc within group
      var j = i
      while (j < sorted.length && sorted(j).getLong(xi) == x) {
        if (sorted(j).getLong(yi) == groupMaxY && groupMaxY > bestY)
          out += sorted(j)
        j += 1
      }
      if (groupMaxY > bestY) bestY = groupMaxY
      i = j
    }
    out.result().iterator
  }
}
