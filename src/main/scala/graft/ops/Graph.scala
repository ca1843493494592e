package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
 * is reused — persisted — across every iteration); each node is stamped
 * ONCE with a has-out-edges flag, so each iteration is ONE src-keyed
 * join + dst-keyed aggregate over the edges plus two 1-row aggregates
 * (dangling mass — a filter+sum over the rank state, never a per-round
 * anti join; node count) that ride broadcast cross joins — no
 * driver-side rank state ever, so billion-node graphs only shuffle
 * (node, flag, double) tuples. Per-iteration results persist at the RDD
 * level (localCheckpoint) to truncate the exponential re-computation a multi-consumer lazy
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

    def pin(df: DataFrame): DataFrame = df.localCheckpoint()

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
    // stamp each node once with "has outgoing edges": the dangling-mass
    // scalar then reads off the rank state as a filter+sum instead of an
    // anti join against the edge list EVERY iteration
    val srcSet = trans.select(col("__src").as("__node")).distinct()
      .withColumn("__hasOut", lit(true))
    val flagged = pin(nodes.join(srcSet, Seq("__node"), "left")
      .select(col("__node"), coalesce(col("__hasOut"), lit(false)).as("__hasOut")))

    var ranks = flagged.crossJoin(broadcast(nDf))
      .select(col("__node"), col("__hasOut"), (lit(1.0) / col("__n")).as("__rank"))
    (1 to iters).foreach { _ =>
      val r = pin(ranks)
      val contribs = r.join(trans, r("__node") === trans("__src"))
        .groupBy(col("__dst").as("__node"))
        .agg(sum(col("__rank") * col("__p")).as("__c"))
      val dangling = r.filter(!col("__hasOut"))
        .agg(coalesce(sum(col("__rank")), lit(0.0)).as("__dm"))
      ranks = flagged.join(contribs, Seq("__node"), "left")
        .crossJoin(broadcast(dangling)).crossJoin(broadcast(nDf))
        .select(col("__node"), col("__hasOut"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / col("__n"))).as("__rank"))
    }
    ranks.select(col("__node").as("node"), col("__rank").as("pagerank"))
  }
}
