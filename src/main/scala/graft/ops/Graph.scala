package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed graph centrality — PageRank (Brin & Page 1998; the damped
 * power iteration every graph engine ships — public literature) over an
 * arbitrary weighted edge list.
 *
 * Semantics: nodes are the union of edge endpoints; parallel edges sum
 * their weights; a node's outgoing probability mass is proportional to
 * edge weight. Each of the fixed `iters` power iterations computes
 * `r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)·p(u→v) + dangling/N)` where
 * `dangling` is the rank mass sitting on nodes with no out-edges
 * (redistributed uniformly, the standard correction that keeps
 * `Σ r = 1` an exact invariant every iteration — spec-pinned).
 *
 * Scale shape: one edge-keyed aggregate builds the transition table (and
 * is reused — persisted — across every iteration); each iteration is ONE
 * src-keyed join + dst-keyed aggregate over the edges, plus two 1-row
 * aggregates (dangling mass, node count) that ride broadcast cross
 * joins — no driver-side rank state ever, so billion-node graphs only
 * shuffle (node, double) pairs. Per-iteration results persist at the RDD
 * level to truncate the exponential re-computation a 3-consumer lazy
 * lineage would otherwise pay (ContextCleaner reclaims the caches once
 * the result's references drop, the same pattern as Skyline/Dedup).
 */
object Graph {

  /** PageRank of every node in `edges`; returns (`node`, `pagerank`).
    * `weightCol` defaults to unweighted (each edge counts 1). Fixed
    * iteration count keeps the result deterministic and replayable. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val spark = edges.sparkSession

    def pin(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      spark.createDataFrame(rdd, df.schema)
    }

    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"), w.as("__w"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .groupBy(col("__src"), col("__dst")).agg(sum(col("__w")).as("__w"))
    val outW = e.groupBy(col("__src")).agg(sum(col("__w")).as("__outw"))
    val trans = pin(e.join(outW, Seq("__src"))
      .select(col("__src"), col("__dst"), (col("__w") / col("__outw")).as("__p")))
    val nodes = pin(trans.select(col("__src").as("__node"))
      .union(trans.select(col("__dst").as("__node"))).distinct())
    val nDf = nodes.agg(count(lit(1)).cast("double").as("__n"))
    // consumed by every iteration's dangling-mass anti join — pin it, or
    // the final plan re-runs the distinct over the edge list `iters` times
    val srcSet = pin(trans.select(col("__src")).distinct())

    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("__node"), (lit(1.0) / col("__n")).as("__rank"))
    (1 to iters).foreach { _ =>
      val r = pin(ranks)
      val contribs = r.join(trans, r("__node") === trans("__src"))
        .groupBy(col("__dst").as("__node"))
        .agg(sum(col("__rank") * col("__p")).as("__c"))
      val dangling = r.join(srcSet, r("__node") === srcSet("__src"), "left_anti")
        .agg(coalesce(sum(col("__rank")), lit(0.0)).as("__dm"))
      ranks = nodes.join(contribs, Seq("__node"), "left")
        .crossJoin(broadcast(dangling)).crossJoin(broadcast(nDf))
        .select(col("__node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / col("__n"))).as("__rank"))
    }
    ranks.select(col("__node").as("node"), col("__rank").as("pagerank"))
  }
}
