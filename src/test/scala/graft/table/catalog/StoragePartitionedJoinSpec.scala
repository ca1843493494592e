package graft.table.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.GraftTable

/**
 * Storage-partitioned joins over bucket-transformed graft tables: two
 * tables bucketed `bucket(n, key)` the same way must join with NO shuffle
 * exchange — Spark aligns the scans' reported KeyGroupedPartitioning
 * through the catalog's `bucket` function.
 */
class StoragePartitionedJoinSpec extends SparkTestBase {

  private def withSpjConfs[A](f: => A): A = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force non-broadcast
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed graft tables join with zero shuffle exchanges") {
    import spark.implicits._
    val wh = tmpDir("spj-wh")
    spark.conf.set("spark.sql.catalog.spjcat",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcat.warehouse", wh)
    try {
      val facts = (0L until 400L).map(i => (i, s"f$i", i * 2.0))
        .toDF("k", "name", "v")
      val dims = (0L until 200L).map(i => (i, s"d$i"))
        .toDF("k", "label")
      val ft = GraftTable.create(spark, s"$wh/db/facts", "spjcat.db.facts",
        facts.schema, Seq("bucket(8,k)"))
      ft.append(facts)
      val dt = GraftTable.create(spark, s"$wh/db/dims", "spjcat.db.dims",
        dims.schema, Seq("bucket(8,k)"))
      dt.append(dims)

      withSpjConfs {
        val joined = spark.sql(
          """SELECT f.k, f.v, d.label
             FROM spjcat.db.facts f JOIN spjcat.db.dims d ON f.k = d.k""")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-bucketed join must be storage-partitioned (no shuffle):\n$plan")
        // correctness: equals the plain dataframe join
        val expect = facts.join(dims, "k").count()
        assert(joined.count() === expect && expect === 200L)
        val sample = joined.filter(col("k") === 42L).collect()
        assert(sample.length === 1 && sample.head.getString(2) === "d42")
      }

      // without the SPJ gate the same join still works (shuffles, same rows)
      val off = spark.sql(
        """SELECT count(*) FROM spjcat.db.facts f
           JOIN spjcat.db.dims d ON f.k = d.k""").collect().head.getLong(0)
      assert(off === 200L)
    } finally {
      spark.conf.unset("spark.sql.catalog.spjcat")
      spark.conf.unset("spark.sql.catalog.spjcat.warehouse")
    }
  }

  test("aggregation on the bucket column rides the reported partitioning") {
    import spark.implicits._
    val wh = tmpDir("spj-agg-wh")
    spark.conf.set("spark.sql.catalog.spjagg",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjagg.warehouse", wh)
    try {
      val t = GraftTable.create(spark, s"$wh/db/t", "spjagg.db.t",
        StructType(Seq(StructField("k", LongType), StructField("v", LongType))),
        Seq("bucket(4,k)"))
      t.append((0L until 200L).map(i => (i % 40, i)).toDF("k", "v"))
      withSpjConfs {
        val agg = spark.sql(
          "SELECT k, sum(v) AS s FROM spjagg.db.t GROUP BY k")
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"group-by on the bucket key must not shuffle:\n$plan")
        val rows = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(rows.size === 40)
        assert(rows(0L) === (0L until 200L by 40).sum)
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.spjagg")
      spark.conf.unset("spark.sql.catalog.spjagg.warehouse")
    }
  }

  test("runtime filtering prunes whole buckets through the transform (DPP)") {
    import spark.implicits._
    val wh = tmpDir("spj-dpp-wh")
    spark.conf.set("spark.sql.catalog.spjdpp",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjdpp.warehouse", wh)
    try {
      val t = GraftTable.create(spark, s"$wh/db/fact", "spjdpp.db.fact",
        StructType(Seq(StructField("k", LongType), StructField("v", LongType))),
        Seq("bucket(16,k)"))
      t.append((0L until 2000L).map(i => (i % 200, i)).toDF("k", "v"))
      // the dim must be a REAL scan with a selective filter: a local
      // relation's filter constant-folds away and DPP requires a selective
      // predicate on the filtering side
      val dimDir = tmpDir("spj-dpp-dim")
      (0L until 200L).map(i => (i, if (i < 9) "hot" else s"l$i"))
        .toDF("k", "label").write.mode("overwrite").parquet(dimDir)
      spark.read.parquet(dimDir).createOrReplaceTempView("__dpp_dim")
      org.apache.spark.sql.graft.GraftBucketedScan.lastPlannedPartitions.set(-1)
      val j = spark.sql(
        """SELECT f.k, count(*) AS n FROM spjdpp.db.fact f
           JOIN __dpp_dim d ON f.k = d.k
           WHERE d.label = 'hot' GROUP BY f.k""")
      val rows = j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows === (0L until 9L).map(_ -> 10L).toMap)
      val planned = org.apache.spark.sql.graft.GraftBucketedScan
        .lastPlannedPartitions.get()
      // 9 hot keys hash into at most 9 of the 16 buckets; whole buckets
      // drop before any task launches
      assert(planned >= 1 && planned <= 9,
        s"runtime filter should drop unprobed buckets, planned=$planned")
      // correctness safety: a non-selective join keeps everything
      val jAll = spark.sql(
        """SELECT count(*) FROM spjdpp.db.fact f
           JOIN __dpp_dim d ON f.k = d.k""")
      assert(jAll.collect().head.getLong(0) === 2000L)
    } finally {
      spark.catalog.dropTempView("__dpp_dim")
      spark.conf.unset("spark.sql.catalog.spjdpp")
      spark.conf.unset("spark.sql.catalog.spjdpp.warehouse")
    }
  }

  test("SPJ survives appends (multiple files per bucket) and filter pushdown") {
    import spark.implicits._
    val wh = tmpDir("spj-wh2")
    spark.conf.set("spark.sql.catalog.spjcat2",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcat2.warehouse", wh)
    try {
      val a = GraftTable.create(spark, s"$wh/db/a", "spjcat2.db.a",
        StructType(Seq(StructField("k", LongType), StructField("v", LongType))),
        Seq("bucket(4,k)"))
      val b = GraftTable.create(spark, s"$wh/db/b", "spjcat2.db.b",
        StructType(Seq(StructField("k", LongType), StructField("w", LongType))),
        Seq("bucket(4,k)"))
      (0 until 3).foreach { batch =>
        a.append((0L until 100L).map(i => (i, batch * 1000L + i)).toDF("k", "v"))
        b.append((0L until 100L).map(i => (i, batch * 2000L + i)).toDF("k", "w"))
      }
      withSpjConfs {
        val j = spark.sql(
          """SELECT a.k, count(*) AS n FROM spjcat2.db.a a
             JOIN spjcat2.db.b b ON a.k = b.k
             WHERE a.k < 50 GROUP BY a.k""")
        val plan = j.queryExecution.executedPlan.toString
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        // the JOIN itself is exchange-free; only the aggregate may shuffle
        assert(!plan.linesIterator.exists(l =>
            l.contains("Exchange") && plan.indexOf("Join") > plan.indexOf(l.trim)),
          s"join input must not shuffle:\n$plan")
        assert(exchanges <= 1, s"expected at most the aggregate exchange:\n$plan")
        val rows = j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(rows.size === 50 && rows.values.forall(_ === 9L)) // 3x3 files
        // pushdown still reaches parquet through the wrapped builder
        val scan = j.queryExecution.executedPlan.toString
        assert(scan.contains("PushedFilters") || scan.contains("pushedFilters"))
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.spjcat2")
      spark.conf.unset("spark.sql.catalog.spjcat2.warehouse")
    }
  }

  test("a null-bucket file disables SPJ key grouping but the read stays correct") {
    import spark.implicits._
    val wh = tmpDir("spj-null-wh")
    spark.conf.set("spark.sql.catalog.spjcat3",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcat3.warehouse", wh)
    try {
      val t = GraftTable.create(spark, s"$wh/db/nb", "spjcat3.db.nb",
        StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))),
        Seq("bucket(4,k)"))
      t.append((0L until 20L).map(i => (i, i * 1.0)).toDF("k", "v"))
      t.append(Seq((null.asInstanceOf[java.lang.Long], -1.0)).toDF("k", "v"))
      // the null row's file sits in the __HIVE_DEFAULT_PARTITION__ dir —
      // no bucket id exists for it, so the scan must fall back to plain
      // partitioning instead of mis-keying (or crashing on) that file
      val df = spark.sql("SELECT k, v FROM spjcat3.db.nb")
      assert(df.count() === 21)
      assert(df.filter(col("k").isNull).count() === 1)
      withSpjConfs {
        val agg = spark.sql(
          "SELECT k, count(*) AS n FROM spjcat3.db.nb GROUP BY k")
        assert(agg.count() === 21) // 20 keys + the null group
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.spjcat3")
      spark.conf.unset("spark.sql.catalog.spjcat3.warehouse")
    }
  }
}
