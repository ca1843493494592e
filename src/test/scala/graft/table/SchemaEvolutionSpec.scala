package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** RENAME/DROP COLUMN as metadata-only commits: the read path unwinds the
  * rename history per file era, so files written before and after a rename
  * union under the current declared name with no rewrite. */
class SchemaEvolutionSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("amount", DoubleType),
    StructField("note", StringType)))

  private def fresh(prefix: String): GraftTable = {
    val t = GraftTable.create(spark, tmpDir(prefix), s"t_$prefix", schema,
      partitionCols = Seq("k"))
    import spark.implicits._
    t.append(Seq(("a", 1.0, "one"), ("b", 2.0, "two")).toDF("k", "amount", "note"))
    t
  }

  test("rename unions old and new file eras under the new name") {
    import spark.implicits._
    val t = fresh("ren")
    t.renameColumn("amount", "value")
    // old files read through the rename; new files carry the new name
    t.append(Seq(("a", 3.0, "three")).toDF("k", "value", "note"))
    val got = t.toDF.select("k", "value", "note").orderBy("value")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq === Seq(("a", 1.0, "one"), ("b", 2.0, "two"), ("a", 3.0, "three")))
    // filters and aggregates on the renamed column span both eras
    assert(t.toDF.filter(col("value") > 1.5).count() === 2)
    assert(t.toDF.agg(sum("value")).head.getDouble(0) === 6.0)
  }

  test("chained renames unwind era by era") {
    import spark.implicits._
    val t = fresh("chain")
    t.renameColumn("amount", "amt")
    t.append(Seq(("c", 4.0, "four")).toDF("k", "amt", "note"))
    t.renameColumn("amt", "value")
    t.append(Seq(("d", 5.0, "five")).toDF("k", "value", "note"))
    assert(t.toDF.agg(sum("value")).head.getDouble(0) === 12.0)
    assert(t.toDF.filter(col("value") === 4.0).select("note").head.getString(0) === "four")
  }

  test("back-to-back renames with no intervening commit unwind newest-first") {
    import spark.implicits._
    val t = fresh("chain0")
    // two renames, NO data commit between them: both records share the
    // same afterSeq, so only strict reverse insertion order resolves the
    // pre-rename files to 'amount' (a sort on afterSeq alone lands on the
    // never-materialized intermediate 'amt' and reads nulls)
    t.renameColumn("amount", "amt")
    t.renameColumn("amt", "value")
    val got = t.toDF.select("k", "value").orderBy("value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("a", 1.0), ("b", 2.0)))
    assert(t.toDF.agg(sum("value")).head.getDouble(0) === 3.0)
    // and a post-rename append still unions cleanly
    t.append(Seq(("c", 4.0, "four")).toDF("k", "value", "note"))
    assert(t.toDF.agg(sum("value")).head.getDouble(0) === 7.0)
  }

  test("cherry-pick across a rename era is rejected") {
    import spark.implicits._
    val t = fresh("cherryren")
    t.createOrReplaceBranch("staged")
    val staged = t.append(
      Seq(("c", 5.0, "five")).toDF("k", "amount", "note"), branch = Some("staged"))
    // main advances, then renames: the staged files store 'amount' but a
    // pick would re-stamp them past the rename — 'value' would read null
    t.append(Seq(("d", 6.0, "six")).toDF("k", "amount", "note"))
    t.renameColumn("amount", "value")
    val ex = intercept[IllegalArgumentException](t.cherryPick(staged.id))
    assert(ex.getMessage.contains("renamed after"))
    // without the rename drift, the same-era pick still works
    val t2 = fresh("cherryok")
    t2.createOrReplaceBranch("staged")
    val ok = t2.append(
      Seq(("c", 5.0, "five")).toDF("k", "amount", "note"), branch = Some("staged"))
    t2.append(Seq(("d", 6.0, "six")).toDF("k", "amount", "note"))
    t2.cherryPick(ok.id)
    assert(t2.toDF.agg(sum("amount")).head.getDouble(0) === 14.0)
  }

  test("rename maps equality-delete keys recorded under the old name") {
    import spark.implicits._
    val t = fresh("rendel")
    // MoR delete keyed on `amount`, then rename amount -> value: the
    // recorded key column must map forward and still delete the row
    t.deleteWhereMoR(col("amount") === 1.0, keyCols = Seq("amount"))
    t.renameColumn("amount", "value")
    val rows = t.toDF.select("k", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq === Seq(("b", 2.0)))
  }

  test("drop column removes it from reads; data files untouched") {
    import spark.implicits._
    val t = fresh("drop")
    val filesBefore = t.toDF.inputFiles.toSet
    t.dropColumn("note")
    assert(t.schema.fieldNames.toSeq === Seq("k", "amount"))
    assert(t.toDF.columns.toSeq === Seq("k", "amount"))
    assert(t.toDF.inputFiles.toSet === filesBefore) // metadata-only
    t.append(Seq(("c", 9.0)).toDF("k", "amount"))
    assert(t.toDF.count() === 3)
  }

  test("time travel after a rename presents the current schema") {
    import spark.implicits._
    val t = fresh("tt")
    t.createOrReplaceBranch("v1")
    t.renameColumn("amount", "value")
    t.append(Seq(("c", 7.0, "seven")).toDF("k", "value", "note"))
    assert(t.asOf("v1").columns.contains("value"))
    assert(t.asOf("v1").agg(sum("value")).head.getDouble(0) === 3.0)
  }

  test("guards: partition column, name reuse, widen resurrection, last column") {
    import spark.implicits._
    val t = fresh("guard")
    intercept[IllegalArgumentException](t.renameColumn("k", "key"))
    intercept[IllegalArgumentException](t.dropColumn("k"))
    t.renameColumn("amount", "value")
    // the old physical name is tombstoned in every reintroduction path
    intercept[IllegalArgumentException](t.addColumn("amount", DoubleType))
    intercept[IllegalArgumentException](t.renameColumn("note", "amount"))
    intercept[IllegalArgumentException](
      t.append(Seq(("z", 1.0, "n", 99.0)).toDF("k", "value", "note", "amount")))
    t.dropColumn("note")
    intercept[IllegalArgumentException](t.addColumn("note", StringType))
    intercept[IllegalArgumentException](t.dropColumn("value")) // would leave only k
  }

  test("compaction after a rename re-stamps files into the current era") {
    import spark.implicits._
    val t = fresh("compact")
    t.renameColumn("amount", "value")
    t.append(Seq(("c", 3.0, "three")).toDF("k", "value", "note"))
    t.rewriteDataFilesSorted(Seq(asc("value")))
    // all live files now physically carry the declared name: stats keys
    // match and file skipping is fully restored on the renamed column
    val liveStats = t.meta.currentSnapshot.get.files.flatMap(_.stats)
    assert(liveStats.nonEmpty && liveStats.forall(_.contains("value")))
    assert(liveStats.forall(s => !s.contains("amount")))
    assert(t.toDF.agg(sum("value")).head.getDouble(0) === 6.0)
    assert(t.scanWhere(col("value") === 3.0).inputFiles.length <
      t.toDF.inputFiles.length)
  }

  test("changelog spans rename eras under the current schema") {
    import spark.implicits._
    val t = fresh("chlog")
    t.createOrReplaceBranch("c1")
    t.renameColumn("amount", "value")
    t.append(Seq(("c", 3.0, "three")).toDF("k", "value", "note"))
    t.createOrReplaceBranch("c2")
    val log = t.changelogBetween("c1", "c2")
    assert(log.columns.contains("value"))
    val rows = log.select("_change_type", "k", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq === Seq(("INSERT", "c", 3.0)))
  }

  test("SQL ALTER TABLE RENAME/DROP COLUMN route through the catalog") {
    val wh = tmpDir("evolve-cat")
    spark.conf.set("spark.sql.catalog.gevo",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gevo.warehouse", wh)
    spark.sql("CREATE TABLE gevo.ns.t (k STRING, amount DOUBLE) USING parquet")
    try {
      spark.sql("INSERT INTO gevo.ns.t VALUES ('a', 1.5)")
      spark.sql("ALTER TABLE gevo.ns.t RENAME COLUMN amount TO value")
      assert(spark.sql("SELECT value FROM gevo.ns.t").head.getDouble(0) === 1.5)
      spark.sql("ALTER TABLE gevo.ns.t ADD COLUMNS (note STRING)")
      spark.sql("ALTER TABLE gevo.ns.t DROP COLUMN note")
      assert(spark.table("gevo.ns.t").columns.toSeq === Seq("k", "value"))
    } finally spark.sql("DROP TABLE gevo.ns.t")
  }
}
