package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Column DEFAULT values (Iceberg v3's initial-default / write-default
 * split, Spark's CURRENT_DEFAULT / EXISTS_DEFAULT keys):
 *
 *  - `addColumn(…, defaultSql = Some(e))` folds `e` ONCE and records the
 *    frozen constant as the column's immutable INITIAL default — rows in
 *    files written before the add read it instead of NULL (per file era,
 *    like renames/promotions);
 *  - the original text becomes the CURRENT write-default in the field
 *    metadata — a write that omits the column stores it;
 *  - `setColumnDefault` changes/drops ONLY the write-default; the initial
 *    default never changes after the add.
 */
class DefaultValuesSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("amount", DoubleType)))

  private def fresh(prefix: String): GraftTable = {
    val t = GraftTable.create(spark, tmpDir(prefix), s"t_$prefix", schema,
      partitionCols = Seq("k"))
    import spark.implicits._
    t.append(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "amount"))
    t
  }

  test("pre-add files read the initial default, post-add rows their values") {
    import spark.implicits._
    val t = fresh("init")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.append(Seq(("c", 3.0, "STORE")).toDF("k", "amount", "channel"))
    val got = t.toDF.select("k", "channel").orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("a", "WEB"), ("b", "WEB"), ("c", "STORE")))
    // filters/aggregates see the default like a stored value
    assert(t.toDF.filter(col("channel") === "WEB").count() === 2)
  }

  test("a post-add NULL stays NULL — the default is an era rule, not coalesce") {
    import spark.implicits._
    val t = fresh("nulls")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.append(Seq(("c", 3.0, null.asInstanceOf[String]))
      .toDF("k", "amount", "channel"))
    val byK = t.toDF.select("k", "channel").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byK("a") === Some("WEB"))
    assert(byK("c") === None)
  }

  test("writes that omit the column store the CURRENT write-default") {
    import spark.implicits._
    val t = fresh("write")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    // append WITHOUT the column: write-default fills
    t.append(Seq(("c", 3.0)).toDF("k", "amount"))
    // change the write-default; initial default must NOT move
    t.setColumnDefault("channel", Some("'STORE'"))
    t.append(Seq(("d", 4.0)).toDF("k", "amount"))
    // drop the write-default; omitting now stores NULL
    t.setColumnDefault("channel", None)
    t.append(Seq(("e", 5.0)).toDF("k", "amount"))
    val byK = t.toDF.select("k", "channel").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byK === Map("a" -> Some("WEB"), "b" -> Some("WEB"),
      "c" -> Some("WEB"), "d" -> Some("STORE"), "e" -> None))
  }

  test("the default folds once at add time — expressions freeze") {
    import spark.implicits._
    val t = fresh("fold")
    t.addColumn("tag", StringType, defaultSql = Some("upper(concat('w', 'eb'))"))
    val rec = t.meta.columnDefaults
    assert(rec.map(_.column) === Seq("tag"))
    assert(rec.head.defaultSql === "'WEB'") // stored FOLDED, not the expression
    assert(t.toDF.select("tag").distinct().head.getString(0) === "WEB")
  }

  test("rename carries the defaulted column's record forward") {
    import spark.implicits._
    val t = fresh("ren")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.renameColumn("channel", "chan")
    assert(t.meta.columnDefaults.map(_.column) === Seq("chan"))
    val got = t.toDF.select("k", "chan").orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("a", "WEB"), ("b", "WEB")))
    // write-default metadata rides the field copy through the rename
    t.append(Seq(("c", 3.0)).toDF("k", "amount"))
    assert(t.toDF.filter(col("k") === "c").select("chan").head.getString(0)
      === "WEB")
  }

  test("type promotion of a defaulted column upcasts the frozen value") {
    import spark.implicits._
    val t = fresh("promo")
    t.addColumn("score", IntegerType, defaultSql = Some("7"))
    t.updateColumnType("score", LongType)
    t.append(Seq(("c", 3.0, 9L)).toDF("k", "amount", "score"))
    val byK = t.toDF.select("k", "score").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byK === Map("a" -> 7L, "b" -> 7L, "c" -> 9L))
  }

  test("drop column sheds its default record") {
    val t = fresh("dropdef")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.dropColumn("channel")
    assert(t.meta.columnDefaults.isEmpty)
  }

  test("MoR equality delete matches rows reading the initial default") {
    import spark.implicits._
    val t = fresh("mor")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.append(Seq(("c", 3.0, "STORE")).toDF("k", "amount", "channel"))
    // pre-add rows READ 'WEB'; an equality delete on that value must drop
    // them even though no file stores it
    t.deleteWhereMoR(col("channel") === "WEB", keyCols = Seq("channel"))
    val rows = t.toDF.select("k", "channel").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("c", "STORE")))
  }

  test("time travel presents the current schema: defaults apply to any snapshot") {
    import spark.implicits._
    val t = fresh("tt")
    t.createOrReplaceBranch("v1")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.append(Seq(("c", 3.0, "STORE")).toDF("k", "amount", "channel"))
    assert(t.asOf("v1").columns.contains("channel"))
    assert(t.asOf("v1").select("channel").distinct().head.getString(0) === "WEB")
  }

  test("changelog spans default eras under the current schema") {
    import spark.implicits._
    val t = fresh("chlog")
    t.createOrReplaceBranch("c1")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    // CoW delete of a PRE-ADD row: its DELETE image must carry the default
    t.deleteWhere(col("amount") === 1.0)
    t.createOrReplaceBranch("c2")
    val rows = t.changelogBetween("c1", "c2")
      .select("_change_type", "k", "channel").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(("DELETE", "a", "WEB")))
  }

  test("compaction materializes defaults into rewritten files") {
    import spark.implicits._
    val t = fresh("compact")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    t.append(Seq(("c", 3.0, "STORE")).toDF("k", "amount", "channel"))
    t.rewriteDataFilesSorted(Seq(asc("amount")))
    // rewritten files physically store the (formerly virtual) defaults
    val byK = t.toDF.select("k", "channel").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byK === Map("a" -> "WEB", "b" -> "WEB", "c" -> "STORE"))
    // and footer stats on the column now exist for the rewritten files
    val liveStats = t.meta.currentSnapshot.get.files.flatMap(_.stats)
    assert(liveStats.nonEmpty && liveStats.forall(_.contains("channel")))
  }

  test("guards: column refs, non-determinism, and bad casts refuse") {
    val t = fresh("guard")
    // references a column — a default has no input row
    val e1 = intercept[IllegalArgumentException](
      t.addColumn("x", StringType, defaultSql = Some("k || '!'")))
    assert(e1.getMessage.contains("Invalid DEFAULT"))
    // non-deterministic
    val e2 = intercept[IllegalArgumentException](
      t.addColumn("x", DoubleType, defaultSql = Some("rand()")))
    assert(e2.getMessage.contains("non-deterministic"))
    // unparseable
    intercept[IllegalArgumentException](
      t.addColumn("x", IntegerType, defaultSql = Some("not a ( sql")))
    // setColumnDefault validates too, and refuses unknown columns
    intercept[IllegalArgumentException](
      t.setColumnDefault("nope", Some("1")))
    intercept[IllegalArgumentException](
      t.setColumnDefault("amount", Some("rand()")))
    // the failed adds must not have leaked schema or records
    assert(t.schema.fieldNames.toSeq === Seq("k", "amount"))
    assert(t.meta.columnDefaults.isEmpty)
  }

  test("setColumnDefault on an original column is write-only — no rewrite of history") {
    import spark.implicits._
    val t = fresh("origdef")
    // `amount` existed from creation: every file stores it, so a default
    // affects only future omitting writes
    t.setColumnDefault("amount", Some("0.0"))
    t.append(Seq(Tuple1("c")).toDF("k"))
    val byK = t.toDF.select("k", "amount").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byK === Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.0))
    assert(t.meta.columnDefaults.isEmpty) // no initial-default record
  }

  test("merge after an ADD COLUMN DEFAULT reads target defaults in the join") {
    import spark.implicits._
    val t = fresh("merge")
    t.addColumn("channel", StringType, defaultSql = Some("'WEB'"))
    // API merge updates amount for key a; the rewritten rows must KEEP
    // reading 'WEB' for the untouched default column
    t.merge(Seq(("a", 10.0, "APP")).toDF("k", "amount", "channel"),
      keys = Seq("k"), updateCols = Seq("amount"))
    val rows = t.toDF.select("k", "amount", "channel").orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq === Seq(("a", 10.0, "WEB"), ("b", 2.0, "WEB")))
  }
}
