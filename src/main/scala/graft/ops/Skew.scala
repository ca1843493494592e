package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation helpers for hot keys at 100 TB scale. AQE's skew-join
 * splitting covers sort-merge joins; these cover the two shapes AQE does
 * not: skewed aggregations and skewed broadcast-ineligible joins.
 */
object Skew {

  /**
   * Two-stage (salted) aggregation: spread each hot key over `salts`
   * sub-keys for the partial aggregate, then combine. Correct for
   * decomposable aggregates (sum/count/min/max).
   *
   * Example: saltedAgg(df, Seq("k"), 32)(sum(col("v")).as("v"), count(lit(1)).as("n"))
   * computes the same result as df.groupBy("k").agg(...) but the first
   * shuffle distributes a hot key over 32 reducers.
   */
  def saltedSumCount(df: DataFrame, keys: Seq[String], salts: Int,
      valueCol: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
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
   * side randomly-but-deterministically, join on (key, salt). Spreads a hot
   * key's rows across `salts` tasks.
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
