package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the r17 scan-fan-out gate: fires only on a genuine parallelism
  * deficit, never through exchanges, and stays result-transparent. */
class ParSpec extends SparkTestBase {

  test("fanOut repartitions a single-partition input to the session target") {
    val df = spark.range(0, 1000, 1, 1).toDF("id")
    val out = Par.fanOut(df, col("id"))
    assert(out.rdd.getNumPartitions === Par.target(df))
    // result-transparent
    assert(out.agg(sum(col("id"))).head.getLong(0) === 499500L)
  }

  test("fanOut is a no-op when the input is already parallel") {
    val t = Par.target(spark.range(1).toDF())
    val df = spark.range(0, 1000, 1, t).toDF("id")
    val out = Par.fanOut(df, col("id"))
    // same plan object semantics: no Repartition node added
    assert(out.queryExecution.logical === df.queryExecution.logical)
  }

  test("fanOut is a no-op when the plan already contains an exchange") {
    val df = spark.range(0, 100, 1, 1).toDF("id")
      .groupBy(col("id") % 3).count()
    val out = Par.fanOut(df, col("count"))
    assert(out.queryExecution.logical === df.queryExecution.logical)
  }

  test("fanOut honors the runtime kill switch") {
    spark.conf.set("spark.graft.fanout.enabled", "false")
    try {
      val df = spark.range(0, 1000, 1, 1).toDF("id")
      val out = Par.fanOut(df, col("id"))
      assert(out.queryExecution.logical === df.queryExecution.logical)
    } finally spark.conf.unset("spark.graft.fanout.enabled")
  }

  test("fanned operators keep oracle-identical results (simhash parity)") {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (i, s"alpha beta gamma delta token$i repeated text ${i % 7}"))
      .toDF("doc_id", "text").repartition(1)
    val fanned = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spark.conf.set("spark.graft.fanout.enabled", "false")
    try {
      val plain = Dedup.simhash(docs, "text", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(fanned.toSeq === plain.toSeq)
    } finally spark.conf.unset("spark.graft.fanout.enabled")
  }
}
