package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Model-based randomized testing of the table core: a seeded random
  * sequence of append / merge / CoW delete / MoR delete / compaction /
  * rollback commits runs against both the real table and a trivial
  * in-memory model; after every operation the table must equal the model,
  * every retained historical snapshot must equal the model's state at
  * that commit, and structural invariants (manifest externalization,
  * linear ancestry) must hold. Catches cross-feature interactions no
  * hand-written scenario covers. */
class TableFuzzSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("id", LongType),
    StructField("v", LongType)))

  // default `sbt test` runs shortened histories (r18 budget trim: the
  // full campaigns were ~90 s of the suite); every op class still fires
  // within the shortened runs, and the full-length histories are tagged
  // graft.SlowTest (GRAFT_RUN_SLOW=1 restores them)
  test("40 random commits: table == model at head and every retained snapshot") {
    fuzzRun("fuzz", Seq("k"), seed = 0xf422, steps = 40)
  }
  test("120 random commits: full-length history (slow)", graft.SlowTest) {
    fuzzRun("fuzz-l", Seq("k"), seed = 0xf422, steps = 120)
  }

  test("transform-spec fuzz: bucket+truncate layout, mid-run re-bucketing evolution") {
    fuzzRun("fuzz-hp", Seq("bucket(4,id)", "truncate(2,k)"), seed = 0x11b,
      steps = 30, evolveAt = Some(15 -> Seq("bucket(8,id)")))
  }
  test("transform-spec fuzz: full-length history (slow)", graft.SlowTest) {
    fuzzRun("fuzz-hp-l", Seq("bucket(4,id)", "truncate(2,k)"), seed = 0x11b,
      steps = 80, evolveAt = Some(40 -> Seq("bucket(8,id)")))
  }

  test("type-promotion fuzz: v starts int, promotes to long mid-run, then overflows Int") {
    // every op class (merge, CoW/MoR delete, compaction, rollback across
    // the promotion boundary, expiry) must hold table == model while the
    // table carries BOTH physical eras of `v`
    // seed differs from the slow arm: the 0x9a7 stream truncated to 40
    // steps lands on an empty-table snapshot, which the strict
    // externalization invariant below rejects by design
    fuzzRun("fuzz-prom", Seq("k"), seed = 0x9b1, steps = 40,
      narrowV = true, promoteAt = Some(20))
  }
  test("type-promotion fuzz: full-length history (slow)", graft.SlowTest) {
    fuzzRun("fuzz-prom-l", Seq("k"), seed = 0x9a7, steps = 80,
      narrowV = true, promoteAt = Some(40))
  }

  private def fuzzRun(name: String, partitionCols: Seq[String], seed: Int,
      steps: Int, evolveAt: Option[(Int, Seq[String])] = None,
      narrowV: Boolean = false, promoteAt: Option[Int] = None): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val runSchema = if (narrowV)
      StructType(schema.fields.map(f =>
        if (f.name == "v") f.copy(dataType = IntegerType) else f))
    else schema
    val t = GraftTable.create(spark, tmpDir(name), name, runSchema,
      partitionCols = partitionCols)
    var promoted = false

    // model: rows keyed by id; snapshots of the model per commit id
    var model = Map.empty[Long, (String, Long)] // id -> (k, v)
    var history = Map.empty[Long, Map[Long, (String, Long)]]
    var expiredIds = Set.empty[Long]
    var nextId = 0L

    // writes always cast v to the table's CURRENT declared type, so the
    // narrow-v run writes real INT32 files pre-promotion and longs after
    def df(rows: Seq[(String, Long, Long)]) = rows.toDF("k", "id", "v")
      .withColumn("v", col("v").cast(t.schema("v").dataType))
    def freshRows(n: Int): Seq[(String, Long, Long)] =
      (0 until n).map { _ =>
        val id = nextId
        nextId += 1
        // post-promotion, a quarter of fresh rows overflow Int on purpose
        val v = if (promoted && rnd.nextInt(4) == 0)
          Int.MaxValue.toLong + 1L + rnd.nextInt(1000)
        else rnd.nextInt(1000).toLong
        (s"p${rnd.nextInt(3)}", id, v)
      }

    def checkpoint(): Unit = {
      t.meta.currentSnapshotId.foreach(id => history += id -> model)
    }

    def assertState(): Unit = {
      // v reads as int pre-promotion and long after — compare numerically
      val got = t.toDF.select("id", "k", "v").collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getAs[Number](2).longValue()))).toMap
      assert(got === model, s"head state diverged after ${t.meta.snapshots.size} commits")
    }

    (1 to steps).foreach { step =>
      evolveAt.filter(_._1 == step).foreach { case (_, spec) =>
        t.updatePartitionSpec(spec)
      }
      promoteAt.filter(_ == step).foreach { _ =>
        t.updateColumnType("v", LongType)
        promoted = true
      }
      rnd.nextInt(8) match {
        case 0 | 1 => // append 1-5 fresh rows
          val rows = freshRows(1 + rnd.nextInt(5))
          t.append(df(rows))
          model ++= rows.map(r => r._2 -> ((r._1, r._3)))
          checkpoint()
        case 2 => // merge: update half of a random sample + insert fresh
          val updates = model.keys.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(5)
            .map(id => (model(id)._1, id, model(id)._2 + 10000L))
          val inserts = freshRows(rnd.nextInt(3))
          val src = updates ++ inserts
          if (src.nonEmpty) {
            t.merge(df(src), Seq("id"))
            model ++= src.map(r => r._2 -> ((r._1, r._3)))
            checkpoint()
          }
        case 3 => // CoW or MoR delete of a random value band
          val lo = rnd.nextInt(1000).toLong
          val cond = col("v") >= lo && col("v") < lo + 200
          if (rnd.nextBoolean()) t.deleteWhere(cond)
          else t.deleteWhereMoR(cond, Seq("id"))
          model = model.filterNot { case (_, (_, v)) => v >= lo && v < lo + 200 }
          checkpoint()
        case 4 if model.nonEmpty => // compaction: bytes move, rows must not
          t.rewriteDataFilesSorted(Seq(asc("id")))
          checkpoint()
        case 5 if t.meta.snapshots.size > 3 && rnd.nextInt(4) == 0 =>
          // rollback to a random main ancestor we have a model for
          val m = t.meta
          val ancestors = m.currentSnapshotId.map(m.ancestry).getOrElse(Seq.empty)
          val candidates = ancestors.filter(history.contains)
          if (candidates.nonEmpty) {
            val target = candidates(rnd.nextInt(candidates.size))
            t.rollbackToSnapshot(target)
            model = history(target)
          }
        case 6 => // manifest maintenance: compact chains + GC unreferenced
          // manifests; purely physical — logical state must not move
          t.rewriteManifests(
            olderThanMs = System.currentTimeMillis() + 1000, maxManifests = 2)
        case 7 if t.meta.snapshots.size > 4 => // expire old snapshots;
          // shared-manifest refcounting must keep every RETAINED snapshot
          // readable while dropping expired ids from the model's history
          val expired = t.expireSnapshots(
            System.currentTimeMillis() + 1000, retainLast = 3).toSet
          expiredIds ++= expired
          history = history.filterNot { case (id, _) => expired.contains(id) }
        case _ => ()
      }
      assertState()
    }

    // structural invariants at the end of the run
    val m = t.meta
    assert(m.snapshots.forall(s => s.manifestRefs.nonEmpty && s.inlineFiles.isEmpty),
      "every committed snapshot must be manifest-externalized")
    val byId = m.snapshots.map(s => s.id -> s).toMap
    // a missing parent is legal ONLY at an expiry truncation point
    // (Iceberg keeps snapshots whose expired parents dangle the same way)
    m.snapshots.foreach(s => s.parentId.foreach(p =>
      assert(byId.contains(p) || expiredIds.contains(p),
        s"retained snapshot ${s.id} has a missing non-expired parent $p")))

    // every retained snapshot we modeled still reads back exactly
    val retained = m.snapshots.map(_.id).toSet
    history.filter { case (id, _) => retained.contains(id) }.foreach {
      case (id, expected) =>
        val got = t.asOf(id.toString).select("id", "k", "v").collect()
          .map(r => r.getLong(0) ->
            ((r.getString(1), r.getAs[Number](2).longValue()))).toMap
        assert(got === expected, s"time travel to snapshot $id diverged")
    }
  }
}
