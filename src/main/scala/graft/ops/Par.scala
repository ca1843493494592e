package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

import scala.util.control.NonFatal

/** Scan-parallelism repair for per-row-expensive operators (r17, guide §2.2
  * "fewer, larger map tasks" inverted for the small-file edge).
  *
  * Spark sizes scan splits by BYTES (`maxPartitionBytes`,
  * `filesource.openCostInBytes`), so a small input — one file, one parquet
  * row group — plans as ONE task no matter how many cores the cluster has.
  * That is the right call when per-row work is cheap (an exchange would
  * cost more than it buys), and exactly wrong when the operator's first
  * stage does heavy per-row compute: tokenize + shingle + explode, vector
  * kernels, fingerprinting. Measured at sf0.1 (single-row-group testdata,
  * 32 cores): the whole tokenize front of the lexical-dedup family ran as
  * one ~0.5 s serial task per consumer; hash-repartitioning the scan first
  * cut d_simhash 0.98→0.40 s and d_jaccard_prefix 1.92→1.27 s while a
  * BLANKET repartition of every table read regressed the cheap relational
  * queries by ~0.4 s each (full-row exchange with no compute to amortize
  * it) — hence an opt-in helper on the heavy operators only, never a
  * global rewrite.
  *
  * Scale safety: the repartition fires ONLY when the input's planned
  * parallelism is under half the session target (max of
  * `spark.sql.shuffle.partitions` and the cluster default parallelism).
  * At 100 TB a scan has thousands of splits, the deficit test fails and
  * this is a no-op — the gate is derived from the session, not a local
  * constant. Inputs whose logical plan can demand a shuffle are left
  * alone: their downstream parallelism is the shuffle's/AQE's, and probing
  * partition counts through an executing adaptive plan would run its
  * upstream query stages.
  */
object Par {

  /** Session parallelism target: shuffle partitions or cluster default
    * parallelism, whichever is larger (both scale with the deployment). */
  def target(df: DataFrame): Int = math.max(
    df.sparkSession.sessionState.conf.numShufflePartitions,
    df.sparkSession.sparkContext.defaultParallelism)

  /** Hash-repartition `df` by `keys` to the session target iff its planned
    * parallelism is under half the target and its plan is a narrow
    * scan/project/filter/generate shape. Keyed repartition skips
    * round-robin's sort-before-repartition pass and stays deterministic
    * under retries; pass a high-cardinality key (the row id). No-op on any
    * error — this is a performance rewrite, never a correctness
    * dependency.
    *
    * The shape gate is LOGICAL, not physical, on purpose: physical
    * exchanges are only inserted by the executedPlan preparations
    * (EnsureRequirements), and probing partition counts through an
    * AQE-wrapped plan with exchanges would EXECUTE its upstream query
    * stages. Any logical operator that can demand a shuffle (join,
    * aggregate, window, sort, repartition, distinct, limit) disqualifies
    * the input — downstream of a shuffle, parallelism is AQE's job. */
  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "fanOut needs at least one partitioning key")
    try {
      // runtime kill switch (also the interleaved-A/B hook: a session conf
      // lets one JVM alternate arms run-by-run, the only contention-robust
      // way to measure a plan rewrite on a shared sandbox)
      if (!df.sparkSession.conf.get("spark.graft.fanout.enabled", "true").toBoolean)
        return df
      import org.apache.spark.sql.catalyst.plans.logical._
      val mayShuffle = df.queryExecution.optimizedPlan.exists {
        case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct |
             _: RepartitionOperation | _: GlobalLimit | _: Intersect |
             _: Except | _: MapGroups | _: CoGroup |
             _: FlatMapGroupsWithState => true
        // subquery expressions (scalar/IN/EXISTS inside a Filter or
        // Project) AQE-wrap the plan even when the main tree is narrow —
        // same hazard as the operators above (r18, advisory fix)
        case p => p.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
      }
      if (mayShuffle) return df
      // belt-and-braces physical gate (r18): if the prepared plan is
      // AQE-wrapped despite the logical screen, probing toRdd would call
      // AdaptiveSparkPlanExec.getFinalPhysicalPlan and EXECUTE its
      // upstream query stages at plan-build time — bail instead
      if (df.queryExecution.executedPlan
          .isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec])
        return df
      val parts = df.queryExecution.toRdd.getNumPartitions
      val t = target(df)
      if (parts.toLong * 2 <= t) df.repartition(t, keys: _*) else df
    } catch { case NonFatal(_) => df }
  }
}
