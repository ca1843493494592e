package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Model-based fuzz of column DEFAULT values composed with the rest of the
 * mutation surface: random interleavings of appends (with and without the
 * added columns), `ADD COLUMN … DEFAULT`, `SET DEFAULT`, renames of
 * defaulted columns, CoW/MoR deletes, updates, compaction, snapshot
 * expiry, and rollback — against an in-memory model that stores each
 * row's READ values as a column map. The era rule under test: a file
 * written before an add reads the frozen initial default; a write that
 * omits the column stores the CURRENT write-default; rollback moves refs
 * but never un-evolves the schema, so rolled-back states re-read under
 * the current schema with defaults applied (the model widens its recorded
 * states the same way).
 */
class DefaultValuesFuzzSpec extends SparkTestBase {

  private val baseSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField("p", StringType)))

  private type MRow = Map[String, Any]

  // r18 budget trim: one seed by default, the second tagged slow
  test("defaults-era fuzz: 1 seed x 40 ops match the column-map model") {
    campaign(19)
  }
  test("defaults-era fuzz, extra seed (slow)", graft.SlowTest) {
    campaign(73)
  }

  private def campaign(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val t = GraftTable.create(spark, tmpDir(s"fuzz-dflt-$seed"),
      s"fzd$seed", baseSchema, partitionCols = Seq("p"))

    // declared data columns in order; parallel add bookkeeping
    var cols: Vector[String] = Vector("k", "v", "p")
    // (name, initial-default read value) for columns added so far
    var added: Vector[(String, Any)] = Vector.empty
    var model = Vector.empty[MRow]
    // snapshot id -> (cols at record time, model state)
    val states = scala.collection.mutable.LinkedHashMap
      .empty[Long, (Vector[String], Vector[MRow])]
    // rename history old -> new (applied when widening recorded states)
    var renames = Map.empty[String, String]
    // current write-default per added column (what an omitting append stores)
    var writeDefault = Map.empty[String, Any]

    def fresh(n: Int, explicit: Boolean): Seq[MRow] = Seq.fill(n) {
      val base: MRow = Map(
        "k" -> rnd.nextInt(200).toLong, "v" -> rnd.nextInt(1000).toDouble,
        "p" -> ("p" + rnd.nextInt(3)))
      if (explicit)
        base ++ added.map { case (c, _) => c -> s"x${rnd.nextInt(50)}" }
      else
        // omitted columns store the CURRENT write-default (may be null)
        base ++ added.map { case (c, _) => c -> writeDefault.getOrElse(c, null) }
    }

    def toDf(rows: Seq[MRow], explicit: Boolean) = {
      import spark.implicits._
      val names = if (explicit) cols else Vector("k", "v", "p")
      val tuples = rows.map(r => (r("k").asInstanceOf[Long],
        r("v").asInstanceOf[Double], r("p").asInstanceOf[String],
        if (explicit && added.nonEmpty)
          added.map { case (c, _) => Option(r(c)).map(_.toString).orNull }
        else Seq.empty[String]))
      val df = tuples.toDF("k", "v", "p", "__added")
      if (explicit && added.nonEmpty)
        added.zipWithIndex.foldLeft(df) { case (d, ((c, _), i)) =>
          d.withColumn(c, col("__added").getItem(i))
        }.drop("__added").select(names.map(col): _*)
      else df.drop("__added")
    }

    def renderedModel(m: Vector[MRow], cs: Vector[String]): Vector[String] =
      m.map(r => cs.map(c => Option(r.getOrElse(c, null))
        .map(_.toString).getOrElse("∅")).mkString("|")).sorted

    def check(ctx: String): Unit = {
      val got = t.toDF.select(cols.map(col): _*).collect().toVector
        .map(r => cols.indices.map(i => Option(r.get(i))
          .map(_.toString).getOrElse("∅")).mkString("|")).sorted
      assert(got === renderedModel(model, cols), s"seed $seed after $ctx")
      t.meta.currentSnapshotId.foreach(id => states(id) = (cols, model))
    }

    val init = fresh(20, explicit = false)
    t.append(toDf(init, explicit = false))
    model ++= init
    check("init")

    (1 to 40).foreach { i =>
      rnd.nextInt(12) match {
        case 0 | 1 => // append with every current column explicit
          val rows = fresh(4 + rnd.nextInt(6), explicit = true)
          t.append(toDf(rows, explicit = true))
          model ++= rows
          check(s"op$i append explicit")
        case 2 | 3 => // append omitting the added columns (write-default fill)
          val rows = fresh(4 + rnd.nextInt(6), explicit = false)
          t.append(toDf(rows, explicit = false))
          model ++= rows
          check(s"op$i append omitting")
        case 4 => // CoW delete
          val m0 = 2 + rnd.nextInt(4); val r = rnd.nextInt(m0)
          t.deleteWhere(col("k") % m0 === r)
          model = model.filterNot(_("k").asInstanceOf[Long] % m0 == r)
          check(s"op$i deleteWhere(k % $m0 == $r)")
        case 5 => // MoR equality delete — the key may be a DEFAULTED column
          if (added.nonEmpty && rnd.nextBoolean()) {
            val (c, _) = added(rnd.nextInt(added.size))
            // delete on the column's most common read value (often the
            // default itself — pre-add rows must match through the era)
            val candidates = model.flatMap(r => Option(r.getOrElse(c, null)))
            if (candidates.nonEmpty) {
              val target = candidates(rnd.nextInt(candidates.size)).toString
              t.deleteWhereMoR(col(c) === target, keyCols = Seq(c))
              model = model.filterNot(r =>
                Option(r.getOrElse(c, null)).map(_.toString).contains(target))
              check(s"op$i deleteWhereMoR($c == $target)")
            }
          } else {
            val m0 = 3 + rnd.nextInt(3); val r = rnd.nextInt(m0)
            t.deleteWhereMoR(col("k") % m0 === r, keyCols = Seq("k"))
            model = model.filterNot(_("k").asInstanceOf[Long] % m0 == r)
            check(s"op$i deleteWhereMoR(k % $m0 == $r)")
          }
        case 6 => // CoW update bumps v — rewritten rows must KEEP defaults
          val m0 = 2 + rnd.nextInt(4); val r = rnd.nextInt(m0)
          t.updateWhere(col("k") % m0 === r, Seq("v" -> (col("v") + 1.0)))
          model = model.map { row =>
            if (row("k").asInstanceOf[Long] % m0 == r)
              row + ("v" -> (row("v").asInstanceOf[Double] + 1.0))
            else row }
          check(s"op$i updateWhere(k % $m0 == $r)")
        case 7 => // compaction materializes defaults; content no-op
          if (rnd.nextBoolean()) t.rewriteDataFilesSorted(Seq(asc("k")))
          else t.rewriteDataFilesBinpack(minFileSizeBytes = 1L << 20)
          check(s"op$i compaction")
        case 8 => // expiry: recorded states for expired snapshots drop out
          t.expireSnapshots(System.currentTimeMillis() + 3600000L,
            retainLast = 3)
          t.removeOrphanFiles(dryRun = false,
            olderThanMs = System.currentTimeMillis() + 3600000L)
          check(s"op$i expire")
        case 9 => // rollback: re-read an old state under the CURRENT schema
          val m = t.meta
          val retained = m.currentSnapshotId
            .map(m.ancestry(_)).getOrElse(Seq.empty).filter(states.contains)
          if (retained.nonEmpty) {
            val target = retained(rnd.nextInt(retained.size))
            t.rollbackToSnapshot(target)
            val (stCols, st) = states(target)
            // widen the recorded state to the current schema: renames map
            // forward; columns added since record time read their initial
            // default (the rolled-back files all predate those adds)
            model = st.map { row0 =>
              val row = row0.map { case (c, x) => renames.getOrElse(c, c) -> x }
              val recorded = stCols.map(c => renames.getOrElse(c, c)).toSet
              row ++ added.collect {
                case (c, init) if !recorded.contains(c) => c -> init }
            }
            check(s"op$i rollback to $target")
          }
        case 10 => // ADD COLUMN … DEFAULT (cap at 2 added columns)
          if (added.size < 2) {
            val name = s"c${added.size}_$seed"
            val init = s"d${rnd.nextInt(100)}"
            t.addColumn(name, StringType, defaultSql = Some(s"'$init'"))
            cols :+= name
            added :+= (name, init)
            writeDefault += (name -> init)
            // every existing row's file predates the add: all read init
            model = model.map(_ + (name -> init))
            check(s"op$i addColumn $name default '$init'")
          }
        case 11 => // SET DEFAULT / rename of an added column
          if (added.nonEmpty && rnd.nextBoolean()) {
            val (c, _) = added(rnd.nextInt(added.size))
            val nw = s"w${rnd.nextInt(100)}"
            t.setColumnDefault(c, Some(s"'$nw'"))
            writeDefault += (c -> nw) // future omitting appends only
            check(s"op$i setDefault $c '$nw'")
          } else if (added.nonEmpty && !added.exists(_._1.contains("ren"))) {
            val idx = rnd.nextInt(added.size)
            val (c, init) = added(idx)
            val nn = s"${c}_ren"
            t.renameColumn(c, nn)
            cols = cols.map(x => if (x == c) nn else x)
            added = added.updated(idx, (nn, init))
            renames += (c -> nn)
            writeDefault ++= writeDefault.get(c).map(nn -> _)
            writeDefault -= c
            model = model.map(r =>
              r.get(c).fold(r)(x => r - c + (nn -> x)))
            check(s"op$i rename $c -> $nn")
          }
      }
    }

    // every retained recorded snapshot time-travels to its state, widened
    // to the current schema by the same era rule
    val live = t.meta.snapshots.map(_.id).toSet
    val checked = states.filter { case (id, _) => live.contains(id) }
    assert(checked.nonEmpty, s"seed $seed: no retained snapshots to check")
    checked.foreach { case (id, (stCols, st)) =>
      val widened = st.map { row0 =>
        val row = row0.map { case (c, x) => renames.getOrElse(c, c) -> x }
        val recorded = stCols.map(c => renames.getOrElse(c, c)).toSet
        row ++ added.collect {
          case (c, init) if !recorded.contains(c) => c -> init }
      }
      val got = t.asOfSnapshot(id).select(cols.map(col): _*).collect()
        .toVector.map(r => cols.indices.map(i => Option(r.get(i))
          .map(_.toString).getOrElse("∅")).mkString("|")).sorted
      assert(got === renderedModel(widened, cols),
        s"seed $seed time travel to $id")
    }
    info(s"seed $seed: ${states.size} states recorded, " +
      s"${checked.size} retained snapshots verified; " +
      s"added=${added.map(_._1).mkString(",")}")
  }
}
