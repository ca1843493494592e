package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.GraftTable
import graft.table.catalog.GraftSparkCatalog

/**
 * Memoized graft tables built deterministically from the driver-provided
 * parquet testdata, shared by every versioned/table-layer query in
 * SparkEntry. Built once per (fixture, sfDir) per JVM so Verify/Bench pay
 * the build cost a single time.
 *
 * All splits are deterministic (`key % 3`) so each fixture state is exactly
 * reproducible by the DuckDB oracle with plain filters.
 */
object TableFixtures {

  private val cache = TrieMap.empty[(String, String), GraftTable]

  private def baseDir: String =
    sys.props.getOrElseUpdate("graft.fixtures.dir",
      java.nio.file.Files.createTempDirectory("graft-fixtures").toString)

  /** Register the SQL catalog over this JVM's fixture warehouse and expose
    * ordersVersioned under `graft.fixtures.orders_versioned`. */
  def sqlCatalog(spark: SparkSession, sfDir: String): String = {
    val t = ordersVersioned(spark, sfDir)
    // catalog warehouse = fixture base dir; table path must be warehouse/ns/name
    val wh = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
    spark.conf.set("spark.sql.catalog.graft_fx", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_fx.warehouse", wh)
    assert(t.location.startsWith(wh))
    "graft_fx"
  }

  def read(spark: SparkSession, sfDir: String, t: String): DataFrame =
    spark.read.parquet(s"$sfDir/$t.parquet")

  /**
   * SQL DELETE-with-subquery fixture: the `%3 == 0` order slice, then
   * `DELETE FROM t WHERE o_custkey IN (SELECT c_custkey …)` through the
   * catalog — the anti-set delete every retention pipeline runs. The
   * subquery cannot push as a source filter, so this exercises the
   * GraftDeleteRule routing; state == slice minus orders of customers
   * with c_acctbal > 9000.
   */
  def ordersSubqueryDeleted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_subq_deleted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_subq_deleted"
      GraftTable.drop(spark, loc)
      val cat = sqlCatalog(spark, sfDir)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, s"$cat.orders_subq_deleted",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      read(spark, sfDir, "customer").createOrReplaceTempView("subq_del_customers")
      spark.sql(s"""DELETE FROM $cat.orders_subq_deleted
        WHERE o_custkey IN (SELECT c_custkey FROM subq_del_customers
                            WHERE c_acctbal > 9000)""")
      require(t.meta.currentSnapshot.get.operation == "delete",
        "the subquery DELETE must have committed a delete snapshot")
      t
    })

  /** Correlated-subquery DELETE fixture (round 16): the `%3 == 0` order
    * slice, then `DELETE … WHERE EXISTS (SELECT 1 FROM customer c WHERE
    * c.c_custkey = t.o_custkey AND c.c_acctbal > 9000)` — the correlated
    * retention-pipeline shape, routed through
    * [[graft.sql.CorrelatedCondition]]'s exprId-preserving re-bind into
    * the position-keyed CoW delete. */
  def ordersCorrelatedDeleted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_corr_deleted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_corr_deleted"
      GraftTable.drop(spark, loc)
      val cat = sqlCatalog(spark, sfDir)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, s"$cat.orders_corr_deleted",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      read(spark, sfDir, "customer").createOrReplaceTempView("corr_del_customers")
      spark.sql(s"""DELETE FROM $cat.orders_corr_deleted t
        WHERE EXISTS (SELECT 1 FROM corr_del_customers c
                      WHERE c.c_custkey = t.o_custkey AND c.c_acctbal > 9000)""")
      require(t.meta.currentSnapshot.get.operation == "delete",
        "the correlated DELETE must have committed a delete snapshot")
      t
    })

  /** Correlated-subquery UPDATE twin of [[ordersCorrelatedDeleted]]:
    * `UPDATE … SET o_totalprice = 0 WHERE EXISTS (…)` through the same
    * position-keyed CoW rewrite. */
  def ordersCorrelatedUpdated(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_corr_updated", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_corr_updated"
      GraftTable.drop(spark, loc)
      val cat = sqlCatalog(spark, sfDir)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, s"$cat.orders_corr_updated",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      read(spark, sfDir, "customer").createOrReplaceTempView("corr_upd_customers")
      spark.sql(s"""UPDATE $cat.orders_corr_updated t SET o_totalprice = 0.0
        WHERE EXISTS (SELECT 1 FROM corr_upd_customers c
                      WHERE c.c_custkey = t.o_custkey AND c.c_acctbal > 9000)""")
      require(t.meta.currentSnapshot.get.operation == "update",
        "the correlated UPDATE must have committed an update snapshot")
      t
    })

  /** Correlated SCALAR-subquery SET fixture (round 17): the enrichment
    * idiom `UPDATE t SET x = (SELECT v FROM k WHERE k.id = t.id)` — the
    * per-row looked-up value lands where a match exists and NULL where it
    * does not, through the position-keyed rewrite that evaluates the
    * scalar once per matched row. */
  def ordersCorrelatedSetUpdated(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_corr_set_updated", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_corr_set_updated"
      GraftTable.drop(spark, loc)
      val cat = sqlCatalog(spark, sfDir)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, s"$cat.orders_corr_set_updated",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      read(spark, sfDir, "customer").createOrReplaceTempView("corr_set_customers")
      // c_custkey is unique, so the scalar lookup is single-row by data;
      // orders of customers at acctbal <= 9000 take NULL (no inner match)
      spark.sql(s"""UPDATE $cat.orders_corr_set_updated t
        SET o_totalprice = (SELECT c.c_acctbal FROM corr_set_customers c
                            WHERE c.c_custkey = t.o_custkey
                              AND c.c_acctbal > 9000)
        WHERE t.o_orderkey % 2 = 0""")
      require(t.meta.currentSnapshot.get.operation == "update",
        "the correlated-SET UPDATE must have committed an update snapshot")
      t
    })

  /** Correlated MERGE fixture (round 17): clause CONDITIONS carry
    * correlated EXISTS over an outside relation and the UPDATE value a
    * correlated scalar lookup — the full joined-frame exprId re-bind
    * surface in one statement, CoW cascade. */
  def ordersCorrelatedMerged(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_corr_merged", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_corr_merged"
      GraftTable.drop(spark, loc)
      val cat = sqlCatalog(spark, sfDir)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, s"$cat.orders_corr_merged",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      read(spark, sfDir, "customer").createOrReplaceTempView("corr_mrg_customers")
      orders.filter(col("o_orderkey") % 2 === 0)
        .createOrReplaceTempView("corr_mrg_src")
      spark.sql(s"""MERGE INTO $cat.orders_corr_merged t
        USING corr_mrg_src s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND EXISTS (SELECT 1 FROM corr_mrg_customers c
                                 WHERE c.c_custkey = t.o_custkey
                                   AND c.c_acctbal > 9000)
          THEN UPDATE SET o_totalprice =
            (SELECT c.c_acctbal FROM corr_mrg_customers c
             WHERE c.c_custkey = t.o_custkey)
        WHEN NOT MATCHED AND EXISTS (SELECT 1 FROM corr_mrg_customers c
                                     WHERE c.c_custkey = s.o_custkey
                                       AND c.c_acctbal > 9000)
          THEN INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                       o_orderdate, o_orderpriority)
          VALUES (s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice,
                  s.o_orderdate, s.o_orderpriority)""")
      require(t.meta.currentSnapshot.get.operation == "merge",
        "the correlated MERGE must have committed a merge snapshot")
      t
    })

  /**
   * `MERGE … WITH SCHEMA EVOLUTION` fixture (round 17): the target is
   * created WITHOUT `o_orderpriority`, loaded with the `%3 == 0` slice,
   * then a star-merge of the FULL-schema `%2 == 0` slice under WITH
   * SCHEMA EVOLUTION — the analyzer adds the missing column through the
   * catalog's alterTable and the merge runs against the evolved schema.
   * Final state: all source rows carry their priority; surviving
   * target-only rows (`%3 == 0 && %2 != 0`) read it as NULL out of the
   * pre-evolution files.
   */
  def ordersSchemaEvolvedMerged(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_evo_merged", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_evo_merged"
      GraftTable.drop(spark, loc)
      val cat = sqlCatalog(spark, sfDir)
      val orders = read(spark, sfDir, "orders")
      val narrow = orders.select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate")
      val t = GraftTable.create(spark, loc, s"$cat.orders_evo_merged",
        narrow.schema, partitionCols = Seq("o_orderstatus"))
      t.append(narrow.filter(col("o_orderkey") % 3 === 0))
      orders.filter(col("o_orderkey") % 2 === 0)
        .createOrReplaceTempView("evo_mrg_src")
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.orders_evo_merged t
        USING evo_mrg_src s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val evolved = org.apache.spark.sql.types.DataType
        .fromJson(t.meta.schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      require(evolved.fieldNames.contains("o_orderpriority"),
        "WITH SCHEMA EVOLUTION must have added o_orderpriority")
      t
    })

  /** Column-stats fixture: the `%3 == 0` order slice with
    * `compute_table_stats` run — per-column HLL NDV + null counts pinned
    * to the head snapshot. */
  def ordersStats(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_stats", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_stats"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_stats", orders.schema)
      t.append(orders.filter(org.apache.spark.sql.functions.col("o_orderkey") % 3 === 0))
      t.computeTableStats()
      t
    })

  private val viewCache = TrieMap.empty[String, String]

  /**
   * SQL-view fixture (round 14, Spark 4 ViewCatalog on the graft
   * catalog): a base table loaded with the `%3 == 0` order slice, a
   * status-rollup view CREATEd over it, then the `%3 == 1` slice
   * appended AFTER view creation — a view is stored SQL, not a pinned
   * snapshot, so reads through it MUST see the later commit (the oracle
   * aggregates both slices). Returns the catalog-qualified view name.
   */
  def ordersView(spark: SparkSession, sfDir: String): String =
    viewCache.getOrElseUpdate(sfDir, {
      val cat = sqlCatalog(spark, sfDir)
      val wh = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val loc = s"$wh/orders_view_base"
      GraftTable.drop(spark, loc)
      spark.sql(s"DROP VIEW IF EXISTS $cat.orders_status_v")
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, s"$cat.orders_view_base",
        orders.schema)
      t.append(orders.filter(org.apache.spark.sql.functions.col("o_orderkey") % 3 === 0))
      spark.sql(s"""CREATE VIEW $cat.orders_status_v AS
        SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS cust_sum
        FROM $cat.orders_view_base GROUP BY o_orderstatus""")
      t.append(orders.filter(org.apache.spark.sql.functions.col("o_orderkey") % 3 === 1))
      s"$cat.orders_status_v"
    })

  /**
   * Manifest-bloom fixture: unpartitioned, o_orderkey interleaved mod 4
   * across four single-file appends, so every file's [min, max] straddles
   * every probe key and footer min/max stats can never skip a file — only
   * the per-file manifest bloom (`write.metadata.bloom-filter.column.
   * o_orderkey`) lets a point lookup prune. The scale story this fixture
   * pins: on a 100 TB table whose lookup key is high-cardinality and
   * unsorted, range stats are useless and a point query degenerates to a
   * full file listing; per-file blooms bound it to O(matching files).
   */
  def ordersBloomed(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_bloomed", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_bloomed"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_bloomed",
        orders.schema,
        props = Map(
          "write.metadata.bloom-filter.column.o_orderkey" -> "true",
          "write.metadata.bloom-filter.expected-items" -> "65536",
          "write.metadata.bloom-filter.fpp" -> "0.01"))
      (0 until 4).foreach { i =>
        t.append(orders.filter(col("o_orderkey") % 4 === i).coalesce(1))
      }
      t
    })

  /**
   * Partition-spec evolution fixture (Iceberg `ALTER TABLE … PARTITION
   * FIELD`): batch 0 written under `PARTITIONED BY (o_orderstatus)`
   * (hive-layout directories, status prunes via partition values), then a
   * metadata-only spec switch to `months(o_orderdate)` hidden
   * partitioning (months, not days — orders spans ~7 years and a per-day
   * layout at ~3 rows/day is the small-files anti-pattern this library
   * documents against), then batch 1 written under the NEW spec (status
   * stays in the file, prunes via footer stats; the month dir prunes date
   * predicates). Reads union both eras; no data file was rewritten at the
   * switch. o_orderdate is TIMESTAMP_NTZ in the testdata — the transform
   * renders it zone-free (wall-clock), spec'd in HiddenPartitioningSpec.
   */
  def ordersSpecEvolved(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_spec_evolved", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_spec_evolved"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_spec_evolved",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 2 === 0))
      t.updatePartitionSpec(Seq("months(o_orderdate)"))
      t.append(orders.filter(col("o_orderkey") % 2 === 1))
      t
    })

  /**
   * `orders` loaded as three deterministic batches (o_orderkey % 3 == 0/1/2)
   * with a branch pinned after each append: v1, v2, v3.
   * State at vN == orders where o_orderkey % 3 < N.
   */
  def ordersVersioned(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_versioned", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_versioned"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_versioned",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      (0 until 3).foreach { i =>
        t.append(orders.filter(col("o_orderkey") % 3 === i))
        t.createOrReplaceBranch(s"v${i + 1}")
      }
      // immutable tag on the final state (branch vs tag surface: t_refs)
      t.createTag("rel-1")
      t
    })

  /**
   * Rollback fixture: three appends, then `rollback_to_snapshot` back to the
   * state after batch 1 (Iceberg's rollback procedure — history is kept,
   * main just rewinds). Current state == orders where o_orderkey % 3 <= 1.
   */
  def ordersRolledBack(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_rolled_back", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_rolled_back"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_rolled_back",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      val keep = t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      t.rollbackToSnapshot(keep.id)
      t
    })

  /**
   * Schema-evolution fixture: batch 0 written under the original schema,
   * then `ALTER TABLE ADD COLUMN o_channel string` (one metadata commit, no
   * file rewrite), then batch 1 appended WITH the new column populated
   * deterministically. Old files read the column as null.
   */
  def ordersEvolved(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_evolved", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_evolved"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_evolved",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.addColumn("o_channel", org.apache.spark.sql.types.StringType,
        comment = Some("acquisition channel, added in v2"))
      t.append(orders.filter(col("o_orderkey") % 3 === 1)
        .withColumn("o_channel", upper(substring(col("o_orderpriority"), 1, 1))))
      t
    })

  /**
   * Default-values fixture (round 17, Iceberg v3 initial/write defaults):
   * batch 0 written BEFORE the column exists, then `ADD COLUMN o_channel
   * DEFAULT 'WEB'` (batch-0 rows read the frozen initial default), batch 1
   * appended WITH explicit values, then `SET DEFAULT 'STORE'` and batch 2
   * appended WITHOUT the column (the current write-default fills). Three
   * deterministic slices — the oracle reconstructs each era with a CASE.
   */
  def ordersDefaulted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_defaulted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_defaulted"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_defaulted",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.addColumn("o_channel", org.apache.spark.sql.types.StringType,
        defaultSql = Some("'WEB'"))
      t.append(orders.filter(col("o_orderkey") % 3 === 1)
        .withColumn("o_channel", upper(substring(col("o_orderpriority"), 1, 1))))
      t.setColumnDefault("o_channel", Some("'STORE'"))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      t
    })

  /**
   * Changelog fixture: batch 0 appended (branch `c1`), then a CoW DELETE of
   * o_totalprice > 300000 and a CoW UPDATE re-prioritizing the
   * 200000..300000 band (branch `c2`). `changelogBetween("c1","c2")` must
   * emit exactly: DELETEs for the removed rows, DELETE+INSERT pre/post
   * image pairs for the updated rows, nothing for carried-over rows.
   */
  def ordersChangelog(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_changelog", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_changelog"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_changelog",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.createOrReplaceBranch("c1")
      t.deleteWhere(col("o_totalprice") > 300000)
      t.updateWhere(col("o_totalprice") > 200000, Seq(
        "o_orderpriority" -> lit("X-CHANGED")))
      t.createOrReplaceBranch("c2")
      t
    })

  /**
   * MERGE fixture: target = lineitem line 1 rows (partitioned by
   * l_returnflag); source = line 2 rows keyed on l_orderkey, updating
   * (l_quantity, l_extendedprice, l_linenumber). Result state is exactly
   * expressible in SQL as a full-outer coalesce of the two line sets.
   */
  def lineitemMerged(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("lineitem_merged", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/lineitem_merged"
      GraftTable.drop(spark, loc)
      val li = read(spark, sfDir, "lineitem")
      val t = GraftTable.create(spark, loc, "graft.lineitem_merged",
        li.schema, partitionCols = Seq("l_returnflag"))
      // the synthetic lineitem repeats (orderkey, linenumber) pairs, so both
      // sides are deduplicated deterministically: target keeps one line-1 row
      // per order, source keeps one line-2 row per order (max full-row order)
      import org.apache.spark.sql.expressions.Window
      val rowOrder = Seq(col("l_partkey").desc, col("l_suppkey").desc,
        col("l_quantity").desc, col("l_extendedprice").desc, col("l_discount").desc,
        col("l_tax").desc, col("l_returnflag").desc, col("l_linestatus").desc,
        col("l_shipdate").desc)
      def onePerOrder(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("l_orderkey")).orderBy(rowOrder: _*)))
        .filter(col("__rn") === 1).drop("__rn")
      t.append(onePerOrder(li.filter(col("l_linenumber") === 1)))
      t.merge(
        onePerOrder(li.filter(col("l_linenumber") === 2)),
        keys = Seq("l_orderkey"),
        updateCols = Seq("l_quantity", "l_extendedprice", "l_linenumber"))
      t
    })

  /**
   * WAP accept path: main = orders batch 0; clean batch 1 staged on a WAP
   * branch, audited (no nulls in o_orderpriority), fast-forwarded to main.
   * Final state == orders where o_orderkey % 3 <= 1.
   */
  def wapAccepted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("wap_accepted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/wap_accepted"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.wap_accepted",
        orders.schema, partitionCols = Seq("o_orderstatus"),
        props = Map("write.wap.enabled" -> "true"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      spark.conf.set("spark.graft.wap.branch", "wap_stage")
      try {
        t.append(orders.filter(col("o_orderkey") % 3 === 1))
        val staged = t.toDF // wap-redirected read
        val bad = staged.filter(t.schema.fieldNames.map(col(_).isNull).reduce(_ || _)).count()
        if (bad == 0) {
          spark.conf.unset("spark.graft.wap.branch")
          t.fastForward("main", "wap_stage")
        }
      } finally spark.conf.unset("spark.graft.wap.branch")
      t.dropBranch("wap_stage")
      t
    })

  /**
   * WAP reject path: main = orders batch 0; batch 1 staged with
   * o_orderpriority nulled on every 7th order — audit fails, branch is
   * dropped, staged rows never reach main. Final state == batch 0 only.
   */
  def wapRejected(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("wap_rejected", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/wap_rejected"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.wap_rejected",
        orders.schema, partitionCols = Seq("o_orderstatus"),
        props = Map("write.wap.enabled" -> "true"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      val dirty = orders.filter(col("o_orderkey") % 3 === 1)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderpriority")))
      spark.conf.set("spark.graft.wap.branch", "wap_stage")
      try {
        t.append(dirty)
        val bad = t.toDF.filter(t.schema.fieldNames.map(col(_).isNull).reduce(_ || _)).count()
        spark.conf.unset("spark.graft.wap.branch")
        if (bad > 0) t.dropBranch("wap_stage") // reject: discard staged commits
        else t.fastForward("main", "wap_stage")
      } finally spark.conf.unset("spark.graft.wap.branch")
      t
    })

  /**
   * Copy-on-write DELETE fixture: orders batch 0 loaded, then
   * high-value rows deleted. State == orders where o_orderkey%3=0 AND NOT
   * (o_totalprice > 300000).
   */
  def ordersDeleted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_deleted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_deleted"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_deleted",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.deleteWhere(col("o_totalprice") > 300000)
      t
    })

  /**
   * Copy-on-write UPDATE fixture: orders batch 0 loaded, then high-value
   * rows re-prioritized with row-referencing SET expressions (the SQL
   * `UPDATE … SET … WHERE …` path). State == orders where o_orderkey%3=0
   * with o_orderpriority/o_custkey rewritten where o_totalprice > 200000.
   */
  def ordersUpdated(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_updated", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_updated"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_updated",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.updateWhere(col("o_totalprice") > 200000, Seq(
        "o_orderpriority" -> lit("0-UPDATED"),
        "o_custkey"       -> (col("o_custkey") + 1000000)))
      t
    })

  /**
   * Merge-on-read DELETE fixture with the sequence-semantics probe: batch 0
   * loaded, high-value rows MoR-deleted (equality-delete file, no rewrite),
   * then the very-high-value subset RE-appended — rows appended after the
   * delete must be live. State == (batch0 minus >300000) plus (batch0 and
   * >400000).
   */
  def ordersMorDeleted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_mor_deleted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_mor_deleted"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_mor_deleted",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.deleteWhereMoR(col("o_totalprice") > 300000, Seq("o_orderkey"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0 && col("o_totalprice") > 400000))
      t
    })

  /**
   * Position-delete fixture: batch 0 loaded, high-value rows deleted by
   * POSITION (file + row index recorded from _metadata, no key columns, no
   * rewrite). State == orders where o_orderkey%3=0 AND NOT(>300000).
   */
  def ordersPosDeleted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_pos_deleted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_pos_deleted"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      // DELETION-VECTOR representation (round 14): the positional delete
      // commits per-file run-length bitsets, read back as a membership
      // probe — same rows deleted, same oracle
      val t = GraftTable.create(spark, loc, "graft.orders_pos_deleted",
        orders.schema, partitionCols = Seq("o_orderstatus"),
        props = Map("write.delete.vector.enabled" -> "true"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.deleteWherePositional(col("o_totalprice") > 300000)
      require(t.meta.currentSnapshot.get.deleteFiles.forall(_.isDv),
        "t_pos_delete fixture must exercise the DV representation")
      t
    })

  /**
   * DETERMINISTIC-POSITION delete fixture for the `position_deletes`
   * metadata table: one file per partition written in o_orderkey order
   * (repartition-by-status + sortWithinPartitions pins every row's
   * parquet row index to its key rank), then a DV positional delete of
   * the high-value band — so the oracle can recompute the exact deleted
   * positions as `row_number() over (partition by status order by key) - 1`.
   */
  def ordersPosIndexed(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_pos_indexed", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_pos_indexed"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_pos_indexed",
        orders.schema, partitionCols = Seq("o_orderstatus"),
        props = Map("write.delete.vector.enabled" -> "true"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0)
        .repartition(col("o_orderstatus"))
        .sortWithinPartitions("o_orderkey"))
      t.deleteWherePositional(col("o_totalprice") > 300000)
      t
    })

  /**
   * Position-delete MAINTENANCE fixture: two small files, a positional
   * delete spanning both, then a binpack — which materializes those rows
   * away but must carry the delete file for safety (now 100% dangling) —
   * a second positional delete against the compacted file, and
   * `rewrite_position_delete_files`. End state: ONE position-delete file
   * holding exactly the second delete's entries, table content unchanged
   * == (keys %3 in {0,1}) minus both delete bands.
   */
  def ordersPosRewritten(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_pos_rewritten", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_pos_rewritten"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      // starts in legacy row-list mode, flips to DV mode before the
      // rewrite: the maintenance pass is also the list->DV MIGRATION
      val t = GraftTable.create(spark, loc, "graft.orders_pos_rewritten",
        orders.schema)
      t.append(orders.filter(col("o_orderkey") % 3 === 0).coalesce(1))
      t.append(orders.filter(col("o_orderkey") % 3 === 1).coalesce(1))
      t.deleteWherePositional(col("o_totalprice") > 300000)
      t.rewriteDataFilesBinpack(minFileSizeBytes = Long.MaxValue)
      t.deleteWherePositional(col("o_orderkey") % 10 === 7)
      t.setProperties(Map("write.delete.vector.enabled" -> "true"))
      t.rewritePositionDeleteFiles()
      require(t.meta.currentSnapshot.get.deleteFiles.forall(_.isDv),
        "t_rewrite_pos_deletes fixture must migrate row lists to DVs")
      t
    })

  /**
   * Maintenance fixture: ordersVersioned pipeline + sorted compaction +
   * snapshot expiry (branch-pinned v1..v3 survive). Data state == full
   * orders; used to prove maintenance preserves contents.
   */
  /**
   * Binpack fixture: one full-sized batch, then many small appends, then a
   * MoR delete hitting the big file, then binpack — only the small files
   * coalesce, the delete must survive for the untouched big file, and the
   * table must still read exactly (orders minus the deleted band).
   */
  def ordersBinpacked(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_binpacked", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_binpacked"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_binpacked", orders.schema)
      t.append(orders.filter(col("o_orderkey") % 4 =!= 0).coalesce(1))
      val bigSize = t.meta.currentSnapshot.get.files.map(_.sizeBytes).max
      (0 until 4).foreach { b =>
        t.append(orders.filter(col("o_orderkey") % 16 === (b * 4)).coalesce(1))
      }
      t.deleteWhereMoR(col("o_orderkey") % 10 === 3, Seq("o_orderkey"))
      t.rewriteDataFilesBinpack(minFileSizeBytes = bigSize)
      t
    })

  def ordersMaintained(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_maintained", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_maintained"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_maintained",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      (0 until 3).foreach { i =>
        t.append(orders.filter(col("o_orderkey") % 3 === i))
        t.createOrReplaceBranch(s"v${i + 1}")
      }
      t.rewriteDataFilesSorted(Seq(asc_nulls_last("o_custkey"), desc_nulls_first("o_orderkey")))
      t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 2)
      // fixture files are seconds old; lift the in-flight-commit age guard
      t.removeOrphanFiles(dryRun = false, olderThanMs = Long.MaxValue)
      t.rewriteManifests()
      t
    })

  /** Z-order compaction fixture: multi-batch appends rewritten into
    * files Morton-clustered on (o_custkey, o_totalprice) — the layout a
    * 2-D range workload prunes against. */
  def ordersZOrdered(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_zorder", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_zorder"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_zorder",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      (0 until 3).foreach { i =>
        t.append(orders.filter(col("o_orderkey") % 3 === i))
      }
      t.rewriteDataFilesZOrder(Seq("o_custkey", "o_totalprice"))
      t
    })

  /**
   * Hidden-partitioning fixture (Iceberg partition transforms): the events
   * table laid out under `(days(ts), bucket(8, user_id))`. The ts and
   * user_id SOURCE columns stay in the data files at full fidelity — only
   * the derived day / murmur3-bucket values become directories, and
   * predicates on ts/user_id prune whole files through the transforms.
   */
  def eventsHiddenPartitioned(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("events_hidden", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/events_hidden"
      GraftTable.drop(spark, loc)
      val ev = EventsReader.read(spark, sfDir)
      val t = GraftTable.create(spark, loc, "graft.events_hidden", ev.schema,
        partitionCols = Seq("days(ts)", "bucket(8,user_id)"),
        props = Map("write.distribution-mode" -> "hash"))
      t.append(ev)
      t
    })

  /**
   * Schema-evolution fixture: batch 1 written under the original schema,
   * then RENAME COLUMN o_totalprice -> o_amount (metadata only), batch 2
   * under the renamed schema, then DROP COLUMN o_orderpriority, batch 3
   * without it. Reads must union all three file eras under the current
   * declared schema. Data state == full orders with o_totalprice presented
   * as o_amount.
   */
  def ordersRenamed(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_renamed", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_renamed"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_renamed",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.renameColumn("o_totalprice", "o_amount")
      t.append(orders.filter(col("o_orderkey") % 3 === 1)
        .withColumnRenamed("o_totalprice", "o_amount"))
      t.dropColumn("o_orderpriority")
      t.append(orders.filter(col("o_orderkey") % 3 === 2)
        .withColumnRenamed("o_totalprice", "o_amount")
        .drop("o_orderpriority"))
      t
    })

  /**
   * `add_files` onboarding fixture: an empty unpartitioned table adopts
   * the raw driver-provided orders parquet by reference (hard link or
   * copy, zero rewrite) — the read must equal the raw file exactly.
   */
  def ordersImported(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_imported", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_imported"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_imported",
        orders.schema)
      t.addFiles(s"$sfDir/orders.parquet")
      t
    })

  /**
   * Type-promotion fixture (`ALTER COLUMN … TYPE`): batch 1 written with
   * o_custkey declared INT (values fit — the testdata keys are small),
   * then the column promotes to BIGINT (metadata only, no rewrite),
   * batches 2 and 3 written as longs. Reads must scan the INT32 era under
   * its physical type and upcast, so data state == full orders with
   * o_custkey long — the DuckDB oracle is a plain read of raw orders.
   */
  def ordersPromoted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_promoted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_promoted"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val narrow = orders.withColumn("o_custkey", col("o_custkey").cast("int"))
      val t = GraftTable.create(spark, loc, "graft.orders_promoted",
        narrow.schema, partitionCols = Seq("o_orderstatus"))
      t.append(narrow.filter(col("o_orderkey") % 3 === 0))
      t.updateColumnType("o_custkey", org.apache.spark.sql.types.LongType)
      t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      t
    })

  /**
   * MERGE … WHEN MATCHED THEN DELETE fixture: target = orders with
   * o_orderkey % 3 < 2, source = orders with o_orderkey % 5 == 0 — matched
   * source rows delete their target rows, unmatched source rows insert.
   * Final state == orders where (%3 < 2 AND %5 != 0) OR (%3 = 2 AND %5 = 0),
   * exactly replayable by the oracle with plain filters.
   */
  def ordersMergeDeleted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_merge_deleted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_merge_deleted"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_merge_deleted",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 < 2))
      t.merge(orders.filter(col("o_orderkey") % 5 === 0),
        keys = Seq("o_orderkey"), deleteMatched = true)
      t
    })

  /** General-clause SQL MERGE fixture (round 15): conditional `WHEN MATCHED
    * AND …`, three MATCHED clauses first-true-wins, and a conditional
    * INSERT — through the SQL rule's general path (the conditional-cascade
    * CoW rewrite). Base = the `%3 < 2` order slice; source = the `%4 == 0`
    * slice with doubled prices. */
  def ordersMergeConditional(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_merge_cond", sfDir), {
      val cat = sqlCatalog(spark, sfDir)
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_merge_cond"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_merge_cond", orders.schema)
      t.append(orders.filter(col("o_orderkey") % 3 < 2))
      orders.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("p"),
          col("o_custkey"))
        .createOrReplaceTempView("merge_cond_src")
      spark.sql(s"""MERGE INTO $cat.orders_merge_cond t USING merge_cond_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.p > 300000
          THEN UPDATE SET t.o_totalprice = s.p, t.o_orderpriority = 'BUMP'
        WHEN MATCHED AND s.o_custkey % 2 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.o_orderstatus = 'M'
        WHEN NOT MATCHED AND s.p < 100000 THEN
          INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
          VALUES (s.o_orderkey, s.o_custkey, 'N', s.p)""")
      t
    })

  /** [[ordersMergeConditional]]'s merge-on-read twin: the SAME general
    * SQL MERGE on a `write.merge.mode=merge-on-read` table — one
    * equality-delete commit + append instead of a file rewrite; the final
    * state (and hence the oracle) is identical. */
  def ordersMergeConditionalMor(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_merge_cond_mor", sfDir), {
      val cat = sqlCatalog(spark, sfDir)
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_merge_cond_mor"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_merge_cond_mor",
        orders.schema, props = Map("write.merge.mode" -> "merge-on-read"))
      t.append(orders.filter(col("o_orderkey") % 3 < 2))
      orders.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("p"),
          col("o_custkey"))
        .createOrReplaceTempView("merge_cond_mor_src")
      spark.sql(s"""MERGE INTO $cat.orders_merge_cond_mor t
        USING merge_cond_mor_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.p > 300000
          THEN UPDATE SET t.o_totalprice = s.p, t.o_orderpriority = 'BUMP'
        WHEN MATCHED AND s.o_custkey % 2 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.o_orderstatus = 'M'
        WHEN NOT MATCHED AND s.p < 100000 THEN
          INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
          VALUES (s.o_orderkey, s.o_custkey, 'N', s.p)""")
      val snap = t.meta.currentSnapshot.get
      assert(snap.removedFiles.isEmpty &&
        snap.deleteFiles.exists(_.seq == snap.id),
        "merge-on-read general merge must commit deletes, not rewrites")
      t
    })

  /** `WHEN NOT MATCHED BY SOURCE` SQL MERGE fixture (round 15): matched
    * rows accumulate, unreferenced expensive rows delete, the rest are
    * marked stale — the anti-join clause Iceberg's RewriteMergeIntoTable
    * supports and the simple upsert path cannot express. */
  def ordersMergeNmbs(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_merge_nmbs", sfDir), {
      val cat = sqlCatalog(spark, sfDir)
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_merge_nmbs"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_merge_nmbs", orders.schema)
      t.append(orders.filter(col("o_orderkey") % 3 < 2))
      orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("sp"))
        .createOrReplaceTempView("merge_nmbs_src")
      spark.sql(s"""MERGE INTO $cat.orders_merge_nmbs t USING merge_nmbs_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET t.o_totalprice = t.o_totalprice + s.sp
        WHEN NOT MATCHED BY SOURCE AND t.o_totalprice > 200000 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.o_orderpriority = 'STALE'""")
      t
    })

  /** write.sort-order fixture (round 15, Iceberg's WRITE ORDERED BY):
    * orders loaded SHUFFLED into a table declaring
    * `write.sort-order=o_orderkey ASC` + range distribution + a row-count
    * file cap — every data file lands with a tight, disjoint o_orderkey
    * range, so a key-range scan opens a strict subset of files. */
  def ordersWriteOrdered(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_write_ordered", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_write_ordered"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      // ~8 files at ANY scale factor so the pruning claim holds on the
      // smallest fixtures too
      val cap = math.max(50L, orders.count() / 8)
      val t = GraftTable.create(spark, loc, "graft.orders_write_ordered",
        orders.schema,
        props = Map("write.sort-order" -> "o_orderkey ASC NULLS LAST",
          "write.distribution-mode" -> "range",
          "write.target-file-size-rows" -> cap.toString))
      // shuffled input: only the declared write order produces clustering
      t.append(orders.repartition(8, col("o_custkey")))
      t
    })

  /** WAP-by-id fixture (round 15, Iceberg's `spark.wap.id` staging mode):
    * base slice on main; one batch staged under wap id `batch-42`
    * (snapshot in the log, main untouched), audited via the stamped
    * summary, published by cherry-pick; a second batch staged under
    * `batch-43` is never published — its rows must not reach main. */
  def ordersWapId(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_wap_id", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_wap_id"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_wap_id",
        orders.schema, props = Map("write.wap.enabled" -> "true"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      spark.conf.set("spark.graft.wap.id", "batch-42")
      try t.append(orders.filter(col("o_orderkey") % 3 === 1))
      finally spark.conf.unset("spark.graft.wap.id")
      spark.conf.set("spark.graft.wap.id", "batch-43")
      try t.append(orders.filter(col("o_orderkey") % 3 === 2))
      finally spark.conf.unset("spark.graft.wap.id")
      val staged = t.snapshotForWapId("batch-42").getOrElse(
        sys.error("wap id batch-42 not staged"))
      t.cherryPick(staged.id) // publish the audited batch; batch-43 never lands
      t
    })

  /** Per-ref retention fixture (round 15): four appends A/B/C/D on main,
    * branch `pinned` at B with min-snapshots-to-keep=2, tag `aged` at B
    * with max-ref-age-ms=1s. An expire pass dated 1h in the future with
    * retain_last=1 must: drop the aged tag, expire snapshot C (shielded
    * by nothing), and keep A+B alive solely through the pinned branch's
    * retention policy. */
  def ordersRefRetention(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_ref_retention", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_ref_retention"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_ref_retention",
        orders.schema)
      t.append(orders.filter(col("o_orderkey") % 4 === 0)) // A
      t.append(orders.filter(col("o_orderkey") % 4 === 1)) // B
      t.createOrReplaceBranch("pinned")
      t.setRefRetention("pinned", minSnapshotsToKeep = Some(2))
      t.createTag("aged")
      t.setRefRetention("aged", maxRefAgeMs = Some(1000L))
      t.append(orders.filter(col("o_orderkey") % 4 === 2)) // C — expires
      t.append(orders.filter(col("o_orderkey") % 4 === 3)) // D — main head
      val future = System.currentTimeMillis() + 3600L * 1000
      t.expireSnapshots(olderThanMs = future, retainLast = 1, nowMs = future)
      t
    })

  private val bucketedCache = TrieMap.empty[String, (String, String)]
  private val ivfCache = TrieMap.empty[String, graft.ops.Similarity.IvfIndex]

  /** Memoized IVF index over the embeddings table (nCells=16, seed=42) —
    * the k-means fit is one-time INDEXING cost (like building any ANN
    * index), so s_ann_ivf* queries time the probe+search, not the fit.
    * The cell assignment is cached and materialized once per JVM. */
  def ivfIndex(spark: SparkSession, sfDir: String): graft.ops.Similarity.IvfIndex =
    ivfCache.getOrElseUpdate(sfDir, {
      val e = read(spark, sfDir, "embeddings")
      val idx = graft.ops.Similarity.buildIvfIndex(e, nCells = 16)
      val cached = idx.copy(assigned = idx.assigned.cache())
      cached.assigned.count()
      cached
    })

  private val pqCache = TrieMap.empty[String, org.apache.spark.sql.DataFrame]

  /** Trained PQ codebooks over the sf `embeddings` table (m=8 sub-spaces,
    * 16-entry codebooks, 2 quantized Lloyd rounds) — shared by the
    * s_pq_train / s_ann_pq / s_ann_ivfpq rows so the trajectory trains
    * once per process. */
  def pqCodebooks(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame =
    pqCache.getOrElseUpdate(sfDir, {
      val cb = graft.ops.Similarity.pqTrain(
        read(spark, sfDir, "embeddings"), m = 8, ksub = 16, iters = 2).cache()
      cb.count()
      cb
    })

  private val pqIdxCache = TrieMap.empty[String, (String,
    org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  /** Persisted PQ serving set over the IVF fixture: codebooks + the
    * cell-partitioned encoded corpus saved as graft tables
    * (encode-once serving). Returns (location, codebooks, encoded). */
  def pqServing(spark: SparkSession, sfDir: String)
      : (String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    pqIdxCache.getOrElseUpdate(sfDir, {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/pq_index"
      val cb = pqCodebooks(spark, sfDir)
      val idx = ivfIndex(spark, sfDir)
      val encoded = graft.ops.Similarity.pqEncode(
        idx.assigned.select(col("neighbor_id").as("vec_id"), col("__cell"),
          col("__cv").as("embedding")),
        cb, passthrough = Seq("__cell"))
      graft.table.GraftTable.drop(spark, s"$loc/pq_codebooks")
      graft.table.GraftTable.drop(spark, s"$loc/pq_encoded")
      graft.ops.Similarity.savePqIndex(cb, encoded, loc)
      val (cbL, encL) = graft.ops.Similarity.loadPqIndex(spark, loc)
      (loc, cbL, encL)
    })

  private val cloneCache = TrieMap.empty[String, (GraftTable, GraftTable)]

  /**
   * snapshot-clone fixture (`CALL system.snapshot`): source holds the
   * `o_orderkey % 3 IN (0, 1)` slices when the zero-copy clone is taken;
   * the source then appends the `% 3 == 2` slice (the clone must not see
   * it) and BOTH tables run full maintenance — compaction rewrite,
   * expire to one snapshot, orphan collection — which must not cost the
   * other table a byte (hard links are distinct directory entries over
   * shared inodes). Returns (mutated source, maintained clone).
   */
  def ordersCloned(spark: SparkSession, sfDir: String): (GraftTable, GraftTable) =
    cloneCache.getOrElseUpdate(sfDir, {
      val base = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val orders = read(spark, sfDir, "orders")
      GraftTable.drop(spark, s"$base/orders_clone_src")
      GraftTable.drop(spark, s"$base/orders_clone")
      val src = GraftTable.create(spark, s"$base/orders_clone_src",
        "graft.orders_clone_src", orders.schema)
      src.append(orders.filter(col("o_orderkey") % 3 === 0))
      src.append(orders.filter(col("o_orderkey") % 3 === 1))
      val clone = src.snapshotTo(s"$base/orders_clone", "graft.orders_clone",
        link = true)
      src.append(orders.filter(col("o_orderkey") % 3 === 2))
      val horizon = System.currentTimeMillis() + 3600000L
      Seq(clone, src).foreach { t =>
        t.rewriteDataFilesSorted(Seq(org.apache.spark.sql.functions.asc("o_orderkey")))
        t.expireSnapshots(horizon, retainLast = 1)
        t.removeOrphanFiles(dryRun = false, olderThanMs = horizon)
      }
      (src, clone)
    })

  private val ivfRefreshCache = TrieMap.empty[String, String]

  /**
   * Incrementally-maintained persisted IVF index: centers fit by k-means
   * on the `vec_id % 4 == 0` BASE slice only, base assignments written
   * through the same frozen-center assignment the refresh path uses
   * ([[graft.ops.Similarity.assignIvfCells]] — one uniform assignment
   * function), then THREE corpus appends (`% 4 == 1, 2, 3`) folded in via
   * [[graft.ops.Similarity.refreshIvfIndex]] — each a narrow delta
   * assignment + one snapshot append, never a rebuild. Returns the index
   * location; the assigned table ends at 4 append snapshots.
   */
  def ivfRefreshed(spark: SparkSession, sfDir: String): String =
    ivfRefreshCache.getOrElseUpdate(sfDir, {
      import graft.ops.Similarity
      val e = read(spark, sfDir, "embeddings")
      val base = e.filter(col("vec_id") % 4 === 0)
      val centers = Similarity.buildIvfIndex(base, nCells = 16).centers
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/ivf_refresh"
      GraftTable.createOrReplace(spark, s"$loc/centers", "graft.ivfr_centers",
        centers.schema).append(centers)
      val baseAssigned = Similarity.assignIvfCells(base, centers)
      GraftTable.createOrReplace(spark, s"$loc/assigned", "graft.ivfr_assigned",
        baseAssigned.schema, partitionCols = Seq("__cell")).append(baseAssigned)
      (1 to 3).foreach { r =>
        Similarity.refreshIvfIndex(spark, loc, e.filter(col("vec_id") % 4 === r))
      }
      loc
    })

  /**
   * `orders` + `lineitem` written once as BUCKETED catalog tables — 8
   * buckets on the order key, bucket-sorted — so the orderkey join is
   * co-located: both scans expose the same hash partitioning and
   * EnsureRequirements inserts NO exchange (the 100 TB pre-shuffle
   * technique: pay the layout once at write, join shuffle-free forever;
   * `PlanQualitySpec` pins the exchange-free plan). Returns the two
   * qualified table names.
   */
  /**
   * MoR-changelog fixture: batch 0 appended (branch `c1`), then a
   * merge-on-read delete of o_totalprice > 300000 (a delete FILE — no data
   * file moves), then a re-append of the > 400000 slice (branch `c2`).
   * `changelogBetween("c1","c2")` must emit DELETEs for the MoR-deleted
   * rows (via the state diff around the delete commit) and INSERTs for the
   * re-appended rows, proving CDC is uniform across write modes.
   */
  def ordersChangelogMor(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_changelog_mor", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_changelog_mor"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_changelog_mor",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.createOrReplaceBranch("c1")
      t.deleteWhereMoR(col("o_totalprice") > 300000, Seq("o_orderkey"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0 && col("o_totalprice") > 400000))
      t.createOrReplaceBranch("c2")
      t
    })

  /**
   * Hash-distributed write fixture: `write.distribution-mode=hash` clusters
   * each append by partition value, so every commit lands exactly ONE file
   * per partition — the deterministic layout the files/manifests metadata
   * oracles count on. Two appends (`o_orderkey % 2`) → 2 files per status.
   */
  /**
   * Metadata-columns fixture: one single-task append of the `%3 == 0`
   * order slice into an o_orderstatus-partitioned table — exactly ONE
   * data file per partition, so `_pos` within each file is a permutation
   * of 0..n-1 and per-partition aggregates of the metadata columns are
   * fully deterministic (intra-file row order is writer-defined and NOT
   * relied on).
   */
  def ordersMetaCols(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_meta_cols", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_meta_cols"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_meta_cols",
        orders.schema, partitionCols = Seq("o_orderstatus"))
      t.append(orders.filter(col("o_orderkey") % 3 === 0).coalesce(1))
      t
    })

  def ordersHashFiles(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_hash_files", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/orders_hash_files"
      GraftTable.drop(spark, loc)
      val orders = read(spark, sfDir, "orders")
      val t = GraftTable.create(spark, loc, "graft.orders_hash_files",
        orders.schema, partitionCols = Seq("o_orderstatus"),
        props = Map("write.distribution-mode" -> "hash"))
      (0 until 2).foreach(i => t.append(orders.filter(col("o_orderkey") % 2 === i)))
      t
    })

  /**
   * S1 CSV-source fixture (reference IcebergLoadActivityTask.scala:51-63):
   * every generated day folder — including the nullable WAP day — scanned
   * with the explicit 7-column schema and appended into a
   * txn_date-partitioned table in one commit. The oracle re-reads the same
   * CSVs with DuckDB `read_csv`.
   */
  def activityCsvIngested(spark: SparkSession): GraftTable =
    cache.getOrElseUpdate(("activity_csv_ingested", "-"), {
      val loc = s"$baseDir/activity_csv_ingested"
      GraftTable.drop(spark, loc)
      val root = graft.apps.ActivityData.csvFixturesDir
        .getOrElse(sys.error("CSV day fixtures not found on disk"))
      // explicit day-directory list (not a /* glob): globs make Spark's
      // FileStreamSink metadata probe log a FileNotFoundException WARN stack
      val dayDirs = new java.io.File(root).listFiles()
        .filter(_.isDirectory).map(_.getAbsolutePath).sorted.toSeq
      val days = graft.apps.ActivityData.readDayCsv(spark, dayDirs)
      val t = GraftTable.create(spark, loc, "graft.activity_csv",
        graft.apps.ActivityData.schema, partitionCols = Seq("txn_date"))
      t.append(days)
      t
    })

  /** File-stream source over the driver `events` parquet: the stream
    * source monitors a DIRECTORY, so the single testdata file is
    * hard-linked into one (no copy). `ts` streams in whatever vintage the
    * testdata carries (long nanos or timestamp[us] — see
    * [[EventsReader]]); consumers normalize via
    * [[EventsReader.normalizeTs]]. Returns (raw schema, source dir). */
  private def eventsStreamSource(spark: SparkSession, sfDir: String): (org.apache.spark.sql.types.StructType, String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = read(spark, sfDir, "events").schema
    val srcDir = java.nio.file.Paths.get(
      s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/events_stream_src")
    java.nio.file.Files.createDirectories(srcDir)
    val link = srcDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      try java.nio.file.Files.createLink(
        link, java.nio.file.Paths.get(s"$sfDir/events.parquet"))
      catch { case _: Exception => java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"), link) }
    (schema, srcDir.toString)
  }

  /** The `events` table ingested through Structured Streaming: a file
    * source over the driver parquet, run to completion with
    * Trigger.AvailableNow into the exactly-once graft sink
    * (StreamingOps.writeToGraftTable) — every micro-batch is one atomic
    * batch-id-stamped snapshot commit. The materialized table equals the
    * batch `events` table, which is what lets DuckDB oracle a STREAMING
    * pipeline (st_ingest). */
  def streamIngested(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_ingested", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/stream_ingested"
      GraftTable.drop(spark, loc)
      val (schema, srcDir) = eventsStreamSource(spark, sfDir)
      val t = GraftTable.create(spark, loc, "graft.stream_ingested", schema)
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val q = graft.streaming.StreamingOps.writeToGraftTable(
        stream, t, s"$loc-checkpoint",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      t
    })

  /** Watermarked tumbling-window aggregation THROUGH a stream: hourly
    * (window_start epoch-seconds, event_type) counts and exact cents sums,
    * complete-mode foreachBatch overwriting a graft table, run to
    * completion with Trigger.AvailableNow. The final table equals the
    * batch aggregate (integer-cents sums are order-independent), so DuckDB
    * can oracle a stateful windowed STREAMING aggregation (st_window_agg).
    * The watermark bounds state exactly as it would on an unbounded feed. */
  /**
   * `readStream.format("graft-stream")` end to end: `orders` lands in a
   * PARTITIONED graft source table as three deterministic appends
   * (o_orderkey % 3), and after EACH append an AvailableNow run of the
   * graft-stream source (same checkpoint — offsets are snapshot ids, so
   * every run resumes exactly after the last one) appends the new rows to
   * a sink table. Exercises incremental offset planning, restart-resume,
   * and snapshot-log partition-value attachment; the sink must equal the
   * raw `orders` table exactly.
   */
  def streamSourceTail(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_source_tail", sfDir), {
      val dir = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val srcLoc = s"$dir/stream_src_orders"
      val sinkLoc = s"$dir/stream_tail_sink"
      GraftTable.drop(spark, srcLoc)
      GraftTable.drop(spark, sinkLoc)
      val orders = read(spark, sfDir, "orders")
      val src = GraftTable.create(spark, srcLoc, "graft.stream_src_orders",
        orders.schema, Seq("o_orderstatus"))
      // streamed rows surface partition columns LAST
      val streamedSchema = org.apache.spark.sql.types.StructType(
        orders.schema.filterNot(_.name == "o_orderstatus") ++
          orders.schema.filter(_.name == "o_orderstatus"))
      val sink = GraftTable.create(spark, sinkLoc, "graft.stream_tail_sink",
        streamedSchema)
      val cp = s"$sinkLoc-checkpoint"
      (0 until 3).foreach { b =>
        src.append(orders.filter(col("o_orderkey") % 3 === b))
        // the replay-guarded exactly-once sink (batch-id stamped in the
        // snapshot summary), so a retried micro-batch can never double rows
        graft.streaming.StreamingOps.writeToGraftTable(
          spark.readStream.format("graft-stream").load(srcLoc),
          sink, cp,
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
          .awaitTermination()
      }
      sink
    })

  /**
   * CDC changelog-stream fixture (round 14 — the Iceberg CDC-read gap):
   * a deletion-vector source table mutated by append → MoR equality
   * delete → append → DV positional delete, with an AvailableNow
   * changelog-stream run after EACH commit (one shared checkpoint)
   * replaying the change images into a sink via
   * `StreamingOps.replayChangelog`. The sink must equal the source's
   * batch state exactly — which is what lets DuckDB oracle a streamed
   * MERGE/delete replay (st_changelog).
   */
  def streamChangelogReplayed(spark: SparkSession, sfDir: String)
      : (GraftTable, GraftTable, Boolean) =
    changelogCache.getOrElseUpdate(sfDir, {
      val dir = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val srcLoc = s"$dir/stream_cdc_src"
      val sinkLoc = s"$dir/stream_cdc_sink"
      GraftTable.drop(spark, srcLoc)
      GraftTable.drop(spark, sinkLoc)
      val orders = read(spark, sfDir, "orders")
      val src = GraftTable.create(spark, srcLoc, "graft.stream_cdc_src",
        orders.schema, props = Map("write.delete.vector.enabled" -> "true"))
      val sink = GraftTable.create(spark, sinkLoc, "graft.stream_cdc_sink",
        orders.schema)
      val cp = s"$sinkLoc-checkpoint"
      def run(): Unit = spark.readStream.format("graft-stream")
        .option("changelog", "true").load(srcLoc)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.streaming.StreamingOps.replayChangelog(b, sink))
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      src.append(orders.filter(col("o_orderkey") % 3 === 0)); run()
      src.deleteWhereMoR(col("o_totalprice") > 300000, Seq("o_orderkey")); run()
      src.append(orders.filter(col("o_orderkey") % 3 === 1)); run()
      src.deleteWherePositional(col("o_orderkey") % 10 === 7); run()
      // replay-equals-batch parity verified ONCE here: the fixture is
      // immutable per JVM, so the two exceptAll passes are build-time
      // assertions (like every fixture invariant), not per-query work
      val matches = sink.toDF.exceptAll(src.toDF).isEmpty &&
        src.toDF.exceptAll(sink.toDF).isEmpty
      (src, sink, matches)
    })

  private val changelogCache =
    TrieMap.empty[String, (GraftTable, GraftTable, Boolean)]

  /** CoW twin of [[streamChangelogReplayed]] (round 16): the source table
    * runs COPY-ON-WRITE row-level commits — the reference's own
    * `write.delete.mode='copy-on-write'` shape — so every delete/update
    * is a file rewrite. The changelog stream emits the removed files'
    * rows as full-row DELETE images and the rewritten files' rows as
    * INSERT images (carryover pairs included); replayChangelog nets them
    * per commit, landing the sink on the exact batch state. */
  def streamChangelogCowReplayed(spark: SparkSession, sfDir: String)
      : (GraftTable, GraftTable, Boolean) =
    changelogCowCache.getOrElseUpdate(sfDir, {
      val dir = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val srcLoc = s"$dir/stream_cdc_cow_src"
      val sinkLoc = s"$dir/stream_cdc_cow_sink"
      GraftTable.drop(spark, srcLoc)
      GraftTable.drop(spark, sinkLoc)
      val orders = read(spark, sfDir, "orders")
      val src = GraftTable.create(spark, srcLoc, "graft.stream_cdc_cow_src",
        orders.schema)
      val sink = GraftTable.create(spark, sinkLoc, "graft.stream_cdc_cow_sink",
        orders.schema)
      val cp = s"$sinkLoc-checkpoint"
      def run(): Unit = spark.readStream.format("graft-stream")
        .option("changelog", "true").load(srcLoc)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.streaming.StreamingOps.replayChangelog(b, sink))
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      src.append(orders.filter(col("o_orderkey") % 3 === 0)); run()
      src.deleteWhere(col("o_totalprice") > 300000); run()    // CoW rewrite
      src.append(orders.filter(col("o_orderkey") % 3 === 1)); run()
      src.updateWhere(col("o_orderkey") % 10 === 7,            // CoW rewrite
        Seq("o_totalprice" -> lit(0.0))); run()
      val matches = sink.toDF.exceptAll(src.toDF).isEmpty &&
        src.toDF.exceptAll(sink.toDF).isEmpty
      (src, sink, matches)
    })

  private val changelogCowCache =
    TrieMap.empty[String, (GraftTable, GraftTable, Boolean)]

  /**
   * The FULL streaming-lakehouse loop: graft table -> `graft-stream`
   * source -> watermarked stateful aggregation -> keyed MERGE back into a
   * graft sink, exactly-once at both ends. Events append to the source
   * table as three ts-CONTIGUOUS ranges (so nothing ever arrives later
   * than the 2h watermark), and after each append an AvailableNow run on
   * one shared checkpoint resumes the aggregation state and upserts the
   * updated (window, event_type) rows. The final sink equals the batch
   * windowed aggregate exactly — which is what lets DuckDB oracle a
   * watermark-bounded streaming aggregation fed BY a versioned table
   * (st_source_agg).
   */
  def streamSourceAgg(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_source_agg", sfDir), {
      val dir = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val srcLoc = s"$dir/stream_agg_src"
      val sinkLoc = s"$dir/stream_agg_sink"
      GraftTable.drop(spark, srcLoc)
      GraftTable.drop(spark, sinkLoc)
      val ev = EventsReader.read(spark, sfDir)
      val src = GraftTable.create(spark, srcLoc, "graft.stream_agg_src", ev.schema)
      def agg = spark.readStream.format("graft-stream").load(srcLoc)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long")
            .cast("decimal(38,0)")).cast("long").as("value_cents"))
        .select(unix_timestamp(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("value_cents"))
      val sink = GraftTable.create(spark, sinkLoc, "graft.stream_agg_sink",
        agg.schema)
      val cp = s"$sinkLoc-checkpoint"
      val cut1 = lit("2024-01-11").cast("timestamp")
      val cut2 = lit("2024-01-21").cast("timestamp")
      Seq(col("ts") < cut1,
        col("ts") >= cut1 && col("ts") < cut2,
        col("ts") >= cut2).foreach { range =>
        src.append(ev.filter(range))
        graft.streaming.StreamingOps.writeToGraftTable(
          agg, sink, cp,
          mergeKeys = Seq("window_start", "event_type"),
          outputMode = "update",
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
          .awaitTermination()
      }
      sink
    })

  def streamWindowed(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_windowed", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/stream_windowed"
      GraftTable.drop(spark, loc)
      val (schema, srcDir) = eventsStreamSource(spark, sfDir)
      val agg = EventsReader.normalizeTs(
          spark.readStream.schema(schema).parquet(srcDir))
        .withColumn("ts_t", col("ts"))
        .withWatermark("ts_t", "2 hours")
        .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long")
            .cast("decimal(38,0)")).cast("long").as("value_cents"))
        .select(unix_timestamp(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("value_cents"))
      val t = GraftTable.create(spark, loc, "graft.stream_windowed",
        agg.schema)
      val q = agg.writeStream
        .option("checkpointLocation", s"$loc-checkpoint")
        .outputMode("complete")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          t.overwrite(batch); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      t
    })

  /** A testdata table sorted by `sortCols` and split into `nChunks`
    * contiguous single-file parquet chunks with strictly increasing
    * modification times: a `maxFilesPerTrigger=1` file stream replays them
    * as ORDERED micro-batches (the file source lists oldest-modtime
    * first), so keyed streaming state genuinely persists across batch
    * boundaries — sessions opened in batch N close in batch N+1, dedup
    * keys seen in batch N suppress re-arrivals in batch N+2. The split is
    * deterministic — `sortCols` must be a UNIQUE key (both call sites
    * pass one), and the global rank is computed scale-honestly as
    * range-repartition + in-partition sort + zipWithIndex (contiguous
    * ranges ⇒ partition offsets + local positions ARE the global rank),
    * never a single-partition global window: at 100x a global
    * Window.orderBy would serialize the whole table through one task
    * (and flooded the bench tail with WindowExec warnings). coalesce(1)
    * per chunk is fixture-build cost only, never on a query path. */
  private def chunkedSource(spark: SparkSession, sfDir: String,
      table: String, sortCols: Seq[String], nChunks: Int)
      : (org.apache.spark.sql.types.StructType, String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dirName =
      s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/${table}_chunked_src"
    val srcDir = java.nio.file.Paths.get(dirName)
    val schema = read(spark, sfDir, table).schema
    if (!java.nio.file.Files.exists(srcDir)) {
      java.nio.file.Files.createDirectories(srcDir)
      val df = read(spark, sfDir, table)
      val n = df.count()
      val sorted = df
        .repartitionByRange(math.max(nChunks, 8), sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
      val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L)) }
      val rn = spark.createDataFrame(ranked,
          sorted.schema.add("__rn", org.apache.spark.sql.types.LongType))
        .persist() // rank once; the per-chunk filters below re-read it
      (0 until nChunks).foreach { i =>
        val (lo, hi) = (i * n / nChunks, (i + 1) * n / nChunks)
        val tmp = java.nio.file.Files.createTempDirectory("graft-chunk")
        rn.filter(col("__rn") > lo && col("__rn") <= hi).drop("__rn")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written under $tmp"))
        val dest = srcDir.resolve(f"chunk-$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dest)
        // strictly increasing mtimes pin the replay order
        dest.toFile.setLastModified(1700000000000L + i * 60000L)
        ()
      }
      rn.unpersist()
    }
    (schema, dirName)
  }

  /** Gap-based sessionization THROUGH a stream (flatMapGroupsWithState):
    * events replay as three ordered micro-batches ([[chunkedSource]]), so
    * open sessions genuinely carry across batch boundaries in the state
    * store before closing. Emitted rows are CLOSED sessions only (closure
    * needs a later event > gap away); each user's final session is still
    * open at end-of-input and never emits, which the batch oracle
    * reproduces by dropping each user's last session. Values enter the
    * fold as exact integer cents so the double accumulator is exact and
    * DuckDB's integer sum matches bit-for-bit (st_sessionize). */
  def streamSessions(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_sessions", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/stream_sessions"
      GraftTable.drop(spark, loc)
      val (schema, srcDir) = chunkedSource(spark, sfDir, "events",
        Seq("ts", "event_id"), nChunks = 3)
      import spark.implicits._
      val ev = EventsReader.normalizeTs(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir))
        .select(col("event_id"), col("ts"),
          col("user_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .cast("double").as("value"))
        .as[graft.streaming.StreamingOps.Event]
      val sess = graft.streaming.StreamingOps
        .sessionize(ev, gapMs = 30 * 60 * 1000L).toDF
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("duration_ms"), col("total_value").cast("long").as("value_cents"))
      val t = GraftTable.create(spark, loc, "graft.stream_sessions", sess.schema)
      val q = graft.streaming.StreamingOps.writeToGraftTable(
        sess, t, s"$loc-checkpoint",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      t
    })

  /** Watermarked stream-stream interval join run to completion: view
    * events paired with the same user's purchases within 30 minutes, both
    * sides streaming. The single-file source makes the run one micro-batch,
    * so the inner join's emitted set is the COMPLETE interval join (the
    * watermark's state eviction matters only on unbounded feeds and drops
    * nothing here; StreamingSpec pins eviction separately). Timestamps are
    * truncated to milliseconds on BOTH sides so the join bound matches the
    * oracle's epoch-millisecond arithmetic exactly (st_stream_join). */
  def streamJoinedPairs(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_joined", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/stream_joined"
      GraftTable.drop(spark, loc)
      val (schema, srcDir) = eventsStreamSource(spark, sfDir)
      def side(tpe: String, p: String) = EventsReader.normalizeTs(
          spark.readStream.schema(schema).parquet(srcDir))
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${p}_id"),
          col("user_id").as(s"${p}_user"),
          EventsReader.truncToMillis(col("ts")).as(s"${p}_ts"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as(s"${p}_cents"))
      val joined = graft.streaming.StreamingOps.joinStreams(
        side("view", "v"), side("purchase", "p"),
        "v_user", "p_user", "v_ts", "p_ts",
        withinMs = 30 * 60 * 1000L, watermark = "1 hour")
      val t = GraftTable.create(spark, loc, "graft.stream_joined", joined.schema)
      val q = graft.streaming.StreamingOps.writeToGraftTable(
        joined, t, s"$loc-checkpoint",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      t
    })

  /** Stream-static enrichment run to completion: streaming events left-
    * joined per micro-batch to the static `customer` dimension (broadcast,
    * stateless). Events with no dimension row keep null attributes — the
    * oracle's LEFT JOIN reproduces the semantics exactly (st_enrich). */
  def streamEnriched(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_enriched", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/stream_enriched"
      GraftTable.drop(spark, loc)
      val (schema, srcDir) = eventsStreamSource(spark, sfDir)
      val stream = spark.readStream.schema(schema).parquet(srcDir)
        .select(col("event_id"), col("user_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("value_cents"))
      val dim = read(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      val enriched = graft.streaming.StreamingOps.enrich(
        stream, dim, "user_id", "c_custkey",
        Seq("c_mktsegment", "c_nationkey"))
      val t = GraftTable.create(spark, loc, "graft.stream_enriched",
        enriched.schema)
      val q = graft.streaming.StreamingOps.writeToGraftTable(
        enriched, t, s"$loc-checkpoint",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      t
    })

  /** Streaming exact dedup run to completion over three ordered document
    * micro-batches ([[chunkedSource]]): normalized-content keys seen in an
    * earlier batch suppress identical re-arrivals in later batches through
    * the state store (dropDuplicatesWithinWatermark). Event time is a
    * deterministic function of doc_id and the watermark delay exceeds the
    * synthetic time span, so no state evicts mid-run and the kept set is
    * exactly one row per distinct key — which is what lets DuckDB oracle a
    * STATEFUL streaming dedup (st_dedup asserts n=1 per key). */
  def streamDeduped(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_deduped", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/stream_deduped"
      GraftTable.drop(spark, loc)
      val (schema, srcDir) = chunkedSource(spark, sfDir, "documents",
        Seq("doc_id"), nChunks = 3)
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        // offset keeps every synthetic event time strictly above the
        // engine's INITIAL watermark (epoch 0) — a doc_id=0 row timed at
        // exactly 1970-01-01T00:00:00 would be dropped as late
        .withColumn("__ts",
          timestamp_micros((col("doc_id") + 1000000L) * 1000000L))
      val deduped = graft.streaming.StreamingOps.dedupStream(
        docs, "text", "__ts", watermark = "3650 days").drop("__ts")
      val t = GraftTable.create(spark, loc, "graft.stream_deduped",
        deduped.schema)
      val q = graft.streaming.StreamingOps.writeToGraftTable(
        deduped, t, s"$loc-checkpoint",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      t
    })

  /** CDC-style streaming upsert run to completion over three ordered event
    * micro-batches ([[chunkedSource]]): each batch is reduced to its latest
    * row per `user_id` (latestBy = exact-microsecond ts, event_id — the
    * SAME total order the chunk split uses, so the per-batch winner in the
    * last batch a user appears in is that user's GLOBAL latest event) and
    * MERGEd into the sink keyed on `user_id`, every batch one atomic
    * replay-guarded snapshot commit. The final table holds exactly each
    * user's most recent event, which a batch window query over the raw
    * events can oracle (st_upsert) — proving the foreachBatch CDC-apply
    * idiom (reduce-then-merge) end to end through the state carried in the
    * sink table itself. */
  def streamUpserted(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("stream_upserted", sfDir), {
      val loc = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/stream_upserted"
      GraftTable.drop(spark, loc)
      val (schema, srcDir) = chunkedSource(spark, sfDir, "events",
        Seq("ts", "event_id"), nChunks = 3)
      val ev = EventsReader.normalizeTs(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          unix_micros(col("ts")).as("last_us"),
          col("event_type").as("last_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("last_cents"))
      val t = GraftTable.create(spark, loc, "graft.stream_upserted", ev.schema)
      val q = graft.streaming.StreamingOps.writeToGraftTable(
        ev, t, s"$loc-checkpoint", mergeKeys = Seq("user_id"),
        latestBy = Seq("last_us", "last_event_id"),
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      t
    })

  /**
   * Incremental materialized-rollup maintenance: a per-status summary
   * table kept current from the source's APPEND LOG, never a full
   * re-aggregation. `orders` lands in a source table as three
   * deterministic appends; after each, the checkpointed change consumer
   * ([[GraftTable.consumeChanges]]) reads exactly the delta, aggregates
   * it, and MERGEs additive updates into the rollup (read-modify-write on
   * the grouped rows — the rollup is aggregate-sized by definition). The
   * final rollup must equal the full batch aggregate, which is what lets
   * DuckDB oracle incremental view maintenance (t_incremental_rollup).
   * At 100 TB the per-refresh cost is O(delta) + O(groups), the exact
   * economics that make nightly full refreshes obsolete.
   */
  def ordersIncrementalRollup(spark: SparkSession, sfDir: String): GraftTable =
    cache.getOrElseUpdate(("orders_inc_rollup", sfDir), {
      val dir = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val srcLoc = s"$dir/inc_rollup_src"
      val rollLoc = s"$dir/inc_rollup"
      GraftTable.drop(spark, srcLoc)
      GraftTable.drop(spark, rollLoc)
      val orders = read(spark, sfDir, "orders")
      val src = GraftTable.create(spark, srcLoc, "graft.inc_rollup_src",
        orders.schema)
      val rollSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("total_cents",
          org.apache.spark.sql.types.LongType)))
      val roll = GraftTable.create(spark, rollLoc, "graft.inc_rollup", rollSchema)
      val cp = s"$rollLoc-checkpoint"
      (0 until 3).foreach { b =>
        src.append(orders.filter(col("o_orderkey") % 3 === b))
        src.consumeChanges(cp) { delta =>
          val agg = delta.groupBy(col("o_orderstatus"))
            .agg(count(lit(1)).as("__dn"),
              sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
                .cast("decimal(38,0)")).cast("long").as("__dc"))
          val current = roll.toDF.select(col("o_orderstatus"),
            col("n").as("__cn"), col("total_cents").as("__cc"))
          val next = agg.join(current, Seq("o_orderstatus"), "left")
            .select(col("o_orderstatus"),
              (col("__dn") + coalesce(col("__cn"), lit(0L))).as("n"),
              (col("__dc") + coalesce(col("__cc"), lit(0L))).as("total_cents"))
          roll.merge(next, Seq("o_orderstatus"))
          ()
        }
      }
      roll
    })

  private val spjCache = TrieMap.empty[String, String]

  /**
   * Storage-partitioned-join fixture: orders and lineitem as graft tables
   * bucketed `bucket(8, orderkey)` on BOTH sides — with
   * `spark.sql.sources.v2.bucketing.enabled` the SQL join of the two
   * plans with NO shuffle on either input (the scans report aligned
   * KeyGroupedPartitioning through the catalog's bucket function; pinned
   * in StoragePartitionedJoinSpec). Returns the catalog name.
   */
  def spjBucketedTables(spark: SparkSession, sfDir: String): String =
    spjCache.getOrElseUpdate(sfDir, {
      val cat = sqlCatalog(spark, sfDir) // registers graft_fx over the wh
      val wh = s"$baseDir/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val o = read(spark, sfDir, "orders")
      val l = read(spark, sfDir, "lineitem")
      val ot = GraftTable.createOrReplace(spark, s"$wh/orders_spj",
        s"$cat.orders_spj", o.schema, Seq("bucket(8,o_orderkey)"))
      ot.append(o)
      val lt = GraftTable.createOrReplace(spark, s"$wh/lineitem_spj",
        s"$cat.lineitem_spj", l.schema, Seq("bucket(8,l_orderkey)"))
      lt.append(l)
      cat
    })

  def bucketedTables(spark: SparkSession, sfDir: String): (String, String) =
    bucketedCache.getOrElseUpdate(sfDir, {
      val db = s"graft_buckets_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$baseDir/$db'")
      val (o, l) = (s"$db.orders_b", s"$db.lineitem_b")
      spark.sql(s"DROP TABLE IF EXISTS $o")
      spark.sql(s"DROP TABLE IF EXISTS $l")
      read(spark, sfDir, "orders").write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(o)
      read(spark, sfDir, "lineitem").write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(l)
      (o, l)
    })
}
