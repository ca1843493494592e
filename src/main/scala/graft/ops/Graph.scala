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
 * join + dst-keyed aggregate over the edges plus one 1-row aggregate
 * (dangling mass — a filter+sum over the pinned rank state, never a
 * per-round anti join) whose scalar result is inlined as a literal, like
 * the loop-constant node count. The driver holds exactly two doubles —
 * never per-node rank state — so billion-node graphs only shuffle
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
    // node count as a DRIVER SCALAR (r17): it is a loop constant read off
    // the pinned node set, and inlining it as a literal deletes one 1-row
    // aggregate + broadcast-exchange build job from EVERY iteration's
    // plan (the sweep showed pageRank's wall dominated by job-scheduling
    // barriers, not stage time: 38 stages summing 0.7 s under a 1.6 s
    // wall). One long per graph, never per-node state.
    val n = nodes.count().toDouble
    // stamp each node once with "has outgoing edges": the dangling-mass
    // scalar then reads off the rank state as a filter+sum instead of an
    // anti join against the edge list EVERY iteration
    val srcSet = trans.select(col("__src").as("__node")).distinct()
      .withColumn("__hasOut", lit(true))
    val flagged = pin(nodes.join(srcSet, Seq("__node"), "left")
      .select(col("__node"), coalesce(col("__hasOut"), lit(false)).as("__hasOut")))

    var ranks = flagged
      .select(col("__node"), col("__hasOut"), lit(1.0 / n).as("__rank"))
    (1 to iters).foreach { _ =>
      val r = pin(ranks)
      val contribs = r.join(trans, r("__node") === trans("__src"))
        .groupBy(col("__dst").as("__node"))
        .agg(sum(col("__rank") * col("__p")).as("__c"))
      // dangling mass as a driver scalar too: the rank state is already
      // materialized (pinned), so this is one cheap job over it — where
      // the broadcast-crossjoin form paid a separate broadcast build job
      // per iteration for the same double. Same IEEE arithmetic: the sum
      // is the identical aggregate, the division happens once instead of
      // per row on equal operands.
      val dm = r.filter(!col("__hasOut"))
        .agg(coalesce(sum(col("__rank")), lit(0.0)).as("__dm"))
        .head().getDouble(0)
      ranks = flagged.join(contribs, Seq("__node"), "left")
        .select(col("__node"), col("__hasOut"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              lit(dm / n))).as("__rank"))
    }
    ranks.select(col("__node").as("node"), col("__rank").as("pagerank"))
  }

  /**
   * Exact per-node triangle counting via degree-ordered orientation (the
   * distributed classic — Suri & Vassilvitskii WWW'11; public
   * literature). Input is an arbitrary edge list: direction and
   * multiplicity are ignored, self-loops dropped. Returns (`node`,
   * `n_triangles`) for every node in at least one triangle.
   *
   * Scale shape: each undirected edge is oriented from its lower to its
   * higher endpoint in the (degree, node) total order, which bounds every
   * out-degree by O(√m) on ANY graph — wedge generation Σ outdeg² stays
   * near-linear on power-law degree distributions where a naive adjacency
   * self-join explodes on the hubs. The plan is one node-keyed degree
   * aggregate, two degree-stamp joins (|nodes|-row side), one src-keyed
   * wedge self-join, one (v,w)-keyed closure join, and a 3-endpoint
   * explode + node-keyed count — every shuffle is keyed, nothing is
   * quadratic in a node's raw degree.
   *
   * Fast-path knobs (round 14, both default OFF — the general contract
   * is unchanged):
   *  - `assumeCanonical`: the input is ALREADY a distinct undirected
   *    edge set with src < dst and no nulls/loops (e.g.
   *    [[coOccurrenceEdges]] output, distinct-(u,v)-with-u<v by
   *    construction) — skips the canonicalization distinct, one full
   *    exchange + pin fewer;
   *  - `broadcastDegrees`: the degree table (|nodes| rows) broadcasts
   *    into both stamp joins instead of shuffling the edge set twice.
   *    Correct only when |nodes| is driver/executor-memory-sized — true
   *    for bounded-entity graphs (users, SKUs), NOT for open-world
   *    graphs at 100 TB; hence opt-in.
   */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String,
      assumeCanonical: Boolean = false,
      broadcastDegrees: Boolean = false): DataFrame = {
    // canonical undirected edge set: (a, b) with a < b, no loops, distinct.
    // PINNED (localCheckpoint, as in pageRank): the lazy lineage consumes
    // `und` three ways (degree agg twice via the stamp joins + the stamped
    // edge set) and `oriented` three ways (both wedge legs + the closure),
    // which would recompute the full upstream edge builder ~6x
    // (r17 A/B: dropping this pin in favor of shuffle-reuse of the edge
    // builder's final aggregate measured 0.58 s SLOWER at sf0.1 — the
    // reduce-side recompute per consumer costs more than the barrier)
    val und = (if (assumeCanonical)
        edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      else edges.select(
          least(col(srcCol), col(dstCol)).as("__a"),
          greatest(col(srcCol), col(dstCol)).as("__b"))
        .filter(col("__a").isNotNull && col("__b").isNotNull &&
          col("__a") =!= col("__b"))
        .distinct())
      .localCheckpoint()
    val deg0 = und.select(col("__a").as("__n"))
      .unionAll(und.select(col("__b").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    val deg = if (broadcastDegrees) broadcast(deg0) else deg0
    // stamp both endpoint degrees; orient by the (degree, node) total
    // order — ties on degree fall back to the node id, so the order is
    // strict and the orientation acyclic
    val stamped = und
      .join(deg.select(col("__n").as("__a"), col("__d").as("__da")), Seq("__a"))
      .join(deg.select(col("__n").as("__b"), col("__d").as("__db")), Seq("__b"))
    val aFirst = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("__a") < col("__b"))
    // pinned even in broadcast-degree mode: an A/B at sf0.1 measured the
    // unpinned variant ~15% SLOWER (2.9 s vs 2.5 s) — the three consumers'
    // recomputed projections cost more than the one materialization
    // barrier here, unlike the postings pins where the opposite held.
    // Fan-out before the pin (r17): the checkpoint freezes its input's
    // partition count, and a small oriented edge set arrives AQE-coalesced
    // to a handful of partitions — every downstream wedge/closure task
    // count is then stuck there (sf0.1: the wedge+closure stage carried
    // 5.4 s of CPU over 8 frozen partitions). Deficit-gated like
    // Par.fanOut: at scale the edge set is already wide and this is a
    // no-op; keyed by __src so the wedge self-join reads co-partitioned
    // legs straight off the checkpoint.
    val orientedPlan = stamped.select(
        when(aFirst, col("__a")).otherwise(col("__b")).as("__src"),
        when(aFirst, col("__b")).otherwise(col("__a")).as("__dst"),
        struct(when(aFirst, col("__db")).otherwise(col("__da")).as("d"),
          when(aFirst, col("__b")).otherwise(col("__a")).as("n")).as("__dk"))
    val fanTarget = math.max(
      edges.sparkSession.sessionState.conf.numShufflePartitions,
      edges.sparkSession.sparkContext.defaultParallelism)
    // the .rdd partition probe is safe here: und is a materialized
    // checkpoint, so this reads a partition count, it runs nothing.
    // Known proxy weakness (r18, advisory): und's width stands in for
    // `oriented`'s — under the default broadcastDegrees=false the stamp
    // joins shuffle, and AQE decides THEIR output width at runtime, so
    // the gate can fire on an already-wide join output (harmless extra
    // exchange) or skip a coalesced-narrow one (checkpoint freezes the
    // narrow width). Perf heuristic only, results unaffected; measured
    // fine at both 8 and 32 cores on this suite.
    val oriented = (if (und.rdd.getNumPartitions * 2 <= fanTarget)
        orientedPlan.repartition(fanTarget, col("__src"))
      else orientedPlan)
      .localCheckpoint()
    // wedges u→v, u→w with key(v) < key(w); the closing edge, if the
    // triangle exists, is oriented v→w by the same order
    val e1 = oriented.select(col("__src").as("__u"), col("__dst").as("__v"),
      col("__dk").as("__kv"))
    val e2 = oriented.select(col("__src").as("__u"), col("__dst").as("__w"),
      col("__dk").as("__kw"))
    val wedges = e1.join(e2, Seq("__u")).filter(col("__kv") < col("__kw"))
    val closing = oriented.select(col("__src").as("__v"), col("__dst").as("__w"))
    val tris = wedges.join(closing, Seq("__v", "__w"))
    tris.select(explode(array(col("__u"), col("__v"), col("__w"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * Guarded co-occurrence edge builder: units that share at least
   * `minCells` distinct cells become an undirected edge (`u`, `v`) with
   * `u < v`. The standard co-occurrence-graph construction (market
   * baskets, user sessions), with the standard hot-cell guard: cells
   * holding more than `maxCellSize` units are EXCLUDED from pairing —
   * the stop-word rule. A popular cell carries negligible per-pair
   * signal but |cell|² pair cost; one 10⁵-unit cell alone would emit
   * 10¹⁰ join rows in an unguarded self-join, the classic quadratic
   * scale-killer of co-occurrence pipelines.
   *
   * Scale shape: one cell-keyed count aggregate sizes every cell
   * (mergeable — never materializes members), a cell-keyed join keeps
   * only cells in [2, maxCellSize], and pair generation runs per-cell
   * over a sorted, BOUNDED member array (collect_list is safe only
   * because the size filter runs BEFORE it) — per-row work is at most
   * C(maxCellSize, 2), codegen'd higher-order functions, no self-join.
   * The final (u, v) count aggregate is a keyed shuffle of pair rows.
   */
  def coOccurrenceEdges(occ: DataFrame, unitCol: String,
      cellCols: Seq[String], minCells: Int = 1,
      maxCellSize: Int = 1000): DataFrame = {
    require(minCells >= 1, s"minCells must be >= 1, got $minCells")
    require(maxCellSize >= 2, s"maxCellSize must be >= 2, got $maxCellSize")
    val cells = cellCols.map(col)
    // distinct FIRST (its partial aggregate collapses repeat occurrences
    // map-side — a hot cell's duplicates never ride a shuffle raw), then
    // one EXPLICIT cell-keyed exchange that every downstream step reuses
    // (r17): the size aggregate, the size-filter join and the member
    // collect all require cell clustering, so with both consumers built
    // on the same repartition the optimizer plans ONE shuffle and reuses
    // its map output — the localCheckpoint barrier this replaces
    // materialized the same rows but serialized the job into stages.
    // The partition count is pinned (session target, never an AQE
    // coalesce decision) because pair emission is O(|cell|²) per row
    // while AQE coalesces by BYTES: at sf0.1 it folded the MB-sized
    // member arrays into ONE task and serialized the quadratic work
    // (935 ms of a 2.5 s query); with the pinned fan-out the same stage
    // runs ~30-way parallel. At cluster scale the pin equals the
    // configured shuffle parallelism — the same width the implicit
    // exchange would start from.
    val d = occ.select((col(unitCol).as("__u") +: cells): _*).distinct()
      .repartition(math.max(
        occ.sparkSession.sessionState.conf.numShufflePartitions,
        occ.sparkSession.sparkContext.defaultParallelism), cells: _*)
    val sizes = d.groupBy(cells: _*).agg(count(lit(1)).as("__c"))
      .filter(col("__c").between(2L, maxCellSize.toLong))
      .drop("__c")
    // native pair emitter (graft.functions.SortedPairs) for the long and
    // string unit domains: the HOF flatten(transform(…, transform(slice)))
    // chain it replaces interpreted per element and copied the array tail
    // per position — O(n²) allocations per cell; identical pairs in
    // identical order. Other unit types (int keys, dates, decimals) keep
    // the type-generic HOF form — a working call must never start failing
    // analysis because of the element type.
    val unitType = occ.schema(unitCol).dataType
    val pairEmitter =
      if (unitType == org.apache.spark.sql.types.LongType ||
        unitType == org.apache.spark.sql.types.StringType)
        graft.functions.GraftFunctions.sorted_pairs(col("__us"))
      else expr(
        "flatten(transform(__us, (x, i) -> " +
          "transform(slice(__us, i + 2, size(__us) - i - 1), " +
          "y -> struct(x AS u, y AS v))))")
    d.join(sizes, cellCols)
      .groupBy(cells: _*)
      .agg(array_sort(collect_list(col("__u"))).as("__us"))
      .select(explode(pairEmitter).as("__p"))
      .groupBy(col("__p.u").as("u"), col("__p.v").as("v"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCells.toLong)
      .select(col("u"), col("v"))
  }
}
