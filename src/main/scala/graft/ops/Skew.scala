package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation helpers for hot keys at 100 TB scale. AQE's skew-join
 * splitting covers sort-merge joins; these cover the two shapes AQE does
 * not: skewed aggregations and skewed broadcast-ineligible joins.
 *
 * Salts are DETERMINISTIC functions of row content (xxhash64 over every
 * column), never of `monotonically_increasing_id`/`spark_partition_id`:
 * those change values when a task is recomputed, so a shuffle
 * fetch-failure retry would route rows to different salt partitions than
 * the original attempt and reducers combining old and recomputed map
 * output would double-count some rows and miss others (the SPARK-23207
 * class of nondeterministic-repartition corruption). A content hash
 * re-derives identically on retry. The one case a content hash cannot
 * spread — a hot key whose rows are COMPLETE duplicates across every
 * column — is equally unspreadable by any deterministic function; such
 * rows belong in a pre-aggregation, not a salt.
 */
object Skew {

  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /**
   * Two-stage (salted) aggregation: spread each hot key over `salts`
   * sub-keys for the partial aggregate, then combine. Correct for
   * decomposable aggregates (sum/count/min/max).
   *
   * Example: `saltedSumCount(df, Seq("k"), 32, "v")` computes the same
   * `sum_v` / `cnt` columns as `df.groupBy("k").agg(sum("v"), count(*))`
   * but the first shuffle distributes a hot key over 32 reducers.
   */
  def saltedSumCount(df: DataFrame, keys: Seq[String], salts: Int,
      valueCol: String): DataFrame = {
    val salted = df.withColumn("__salt", contentSalt(df, salts))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /**
   * Salted join for a skewed fact side against a small-but-not-broadcastable
   * dimension: replicate each dimension row `salts` times, salt the fact
   * side by its deterministic content hash, join on (key, salt). Spreads a
   * hot key's rows across `salts` tasks.
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", contentSalt(fact, salts))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
