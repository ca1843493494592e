package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftAggregates.count_min

/**
 * Probing side of the [[graft.functions.CountMin]] sketch — the mergeable
 * frequency summary that complements the exact-candidate Misra-Gries path
 * ([[HeavyHitters]]): MG answers "which items are frequent", a CMS grid
 * answers "how frequent is THIS item" for any item, after the stream is
 * gone, in O(depth) reads.
 */
object Sketch {

  /**
   * Count-min point estimates for every row of `probes`: adds `cms_est`
   * (always ≥ the true count; ≤ true + O(|items|/width) with probability
   * `1 - 2^-depth` per probe).
   *
   * Scale shape: the sketch is built with ONE pass over `items`
   * (map-side partial grids, 64 KB each at the 4×2048 default — the
   * shuffle carries grids, never item counts); the single finished grid
   * is collected (bounded by depth·width, independent of |items|) and
   * probed as a codegen literal — `min_d grid[d·width +
   * pmod(xxhash64(item ++ chr(d+1)), width)]` — so the probe side stays
   * a distributed narrow map over any number of probe rows, no UDF, no
   * join.
   */
  def cmsEstimates(items: DataFrame, itemCol: String, probes: DataFrame,
      probeCol: String, depth: Int = 4, width: Int = 2048): DataFrame = {
    val grid = items
      .agg(count_min(col(itemCol), depth, width).as("__g"))
      .head().getSeq[Long](0)
    require(grid.length == depth * width,
      s"count_min returned ${grid.length} counters, expected ${depth * width}")
    val gridLit = typedlit(grid)
    val ests = (0 until depth).map { d =>
      // chr(d+1) is a single UTF-8 byte for d+1 in [1,127] — the same
      // suffix CountMin.bucket hashes, so SQL xxhash64 lands in the same
      // counter
      element_at(gridLit,
        (lit(d * width) +
          pmod(xxhash64(concat(col(probeCol), lit((d + 1).toChar.toString))),
            lit(width)) + 1).cast("int"))
    }
    probes.withColumn("cms_est", least(ests: _*))
  }
}
