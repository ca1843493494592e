package graft.table

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.MergeClause.src

/**
 * Model fuzz for the general MERGE clause surface: random tables and
 * random clause cascades run through BOTH rewrites (CoW [[GraftTable
 * .mergeInto]] and MoR [[GraftTable.mergeIntoMoR]]) and compared against
 * a driver-side sequential reference executor implementing SQL MERGE
 * semantics directly (null-unsafe key matching, first-true-wins clause
 * order, NULL conditions never fire, unassigned insert columns NULL).
 */
class MergeIntoFuzzSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("n", LongType)))

  // driver-side row models (null = SQL NULL)
  private case class T(id: java.lang.Long, grp: String, n: java.lang.Long)
  private case class S(sid: java.lang.Long, sv: java.lang.Long)

  /** A clause condition as BOTH the Column (engine) and an evaluator
    * (reference); `eval` returns false on SQL-NULL outcomes. */
  private case class Cond(column: Column, eval: (T, S) => Boolean)
  /** An assignment: target column name, Column, reference evaluator
    * returning the new value (null allowed). */
  private case class Assign(name: String, column: Column, eval: (T, S) => Any)

  private sealed trait RefClause { def cond: Option[Cond] }
  private case class RUpdate(cond: Option[Cond], set: Seq[Assign]) extends RefClause
  private case class RDelete(cond: Option[Cond]) extends RefClause
  private case class RInsert(cond: Option[Cond], values: Seq[Assign]) extends RefClause

  private def toClause(c: RefClause): MergeClause = c match {
    case RUpdate(cond, set) =>
      MergeClause.Update(cond.map(_.column), set.map(a => a.name -> a.column))
    case RDelete(cond) => MergeClause.Delete(cond.map(_.column))
    case RInsert(cond, vs) =>
      MergeClause.Insert(cond.map(_.column), vs.map(a => a.name -> a.column))
  }

  /** SQL MERGE reference executor over the in-memory rows. */
  private def reference(target: Seq[T], source: Seq[S],
      matched: Seq[RefClause], notMatched: Seq[RefClause],
      nmbs: Seq[RefClause]): Seq[T] = {
    def firstFiring(cls: Seq[RefClause], t: T, s: S): Option[RefClause] =
      cls.find(c => c.cond.forall(_.eval(t, s)))
    def applyUpdate(t: T, s: S, set: Seq[Assign]): T = {
      val m = set.map(a => a.name -> a.eval(t, s)).toMap
      T(m.getOrElse("id", t.id).asInstanceOf[java.lang.Long],
        m.getOrElse("grp", t.grp).asInstanceOf[String],
        m.getOrElse("n", t.n).asInstanceOf[java.lang.Long])
    }
    val srcById = source.filter(_.sid != null).map(s => s.sid -> s).toMap
    val kept = target.flatMap { t =>
      val m = if (t.id == null) None else srcById.get(t.id)
      m match {
        case Some(s) => firstFiring(matched, t, s) match {
          case Some(RUpdate(_, set)) => Some(applyUpdate(t, s, set))
          case Some(_: RDelete)      => None
          case _                     => Some(t)
        }
        case None => firstFiring(nmbs, t, null) match {
          case Some(RUpdate(_, set)) => Some(applyUpdate(t, null, set))
          case Some(_: RDelete)      => None
          case _                     => Some(t)
        }
      }
    }
    val matchedIds = target.flatMap(t => Option(t.id)).toSet
    val inserts = source
      .filter(s => s.sid == null || !matchedIds.contains(s.sid))
      .flatMap { s =>
        firstFiring(notMatched, null, s).collect { case RInsert(_, vs) =>
          val m = vs.map(a => a.name -> a.eval(null, s)).toMap
          T(m.getOrElse("id", null).asInstanceOf[java.lang.Long],
            m.getOrElse("grp", null).asInstanceOf[String],
            m.getOrElse("n", null).asInstanceOf[java.lang.Long])
        }
      }
    kept ++ inserts
  }

  private def plus(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
    if (a == null || b == null) null else java.lang.Long.valueOf(a + b)

  private def condPoolMatched(r: scala.util.Random): Option[Cond] =
    r.nextInt(6) match {
      case 0 => None
      case 1 =>
        val k = r.nextInt(50).toLong
        Some(Cond(src("sv") > k, (_, s) => s.sv != null && s.sv > k))
      case 2 =>
        val k = r.nextInt(50).toLong
        Some(Cond(col("n") > k, (t, _) => t.n != null && t.n > k))
      case 3 => Some(Cond(src("sv").isNull, (_, s) => s.sv == null))
      case 4 =>
        val k = r.nextInt(80).toLong
        Some(Cond(col("n") + src("sv") > k,
          (t, s) => t.n != null && s.sv != null && t.n + s.sv > k))
      case _ => Some(Cond(col("grp") === "g1", (t, _) => t.grp == "g1"))
    }

  private def condPoolTgt(r: scala.util.Random): Option[Cond] =
    r.nextInt(4) match {
      case 0 => None
      case 1 =>
        val k = r.nextInt(50).toLong
        Some(Cond(col("n") >= k, (t, _) => t.n != null && t.n >= k))
      case 2 => Some(Cond(col("grp").isNull, (t, _) => t.grp == null))
      case _ => Some(Cond(col("grp") === "g2", (t, _) => t.grp == "g2"))
    }

  private def condPoolSrc(r: scala.util.Random): Option[Cond] =
    r.nextInt(3) match {
      case 0 => None
      case 1 =>
        val k = r.nextInt(50).toLong
        Some(Cond(src("sv") > k, (_, s) => s.sv != null && s.sv > k))
      case _ => Some(Cond(src("sv").isNotNull, (_, s) => s.sv != null))
    }

  private def updateAssigns(r: scala.util.Random, tag: String): Seq[Assign] = {
    val pool = Seq(
      Assign("n", src("sv"), (_, s) => s.sv),
      Assign("n", col("n") + src("sv"), (t, s) => plus(t.n, s.sv)),
      Assign("grp", lit(tag), (_, _) => tag))
    val n = 1 + r.nextInt(2)
    r.shuffle(pool).take(n).groupBy(_.name).map(_._2.head).toSeq
  }

  private def nmbsAssigns(r: scala.util.Random, tag: String): Seq[Assign] = {
    val pool = Seq(
      Assign("n", col("n") * 2, (t, _) =>
        if (t.n == null) null else java.lang.Long.valueOf(t.n * 2)),
      Assign("grp", lit(tag), (_, _) => tag))
    Seq(pool(r.nextInt(pool.size)))
  }

  private def insertValues(r: scala.util.Random, tag: String): Seq[Assign] = {
    val base = Seq(Assign("id", src("sid"), (_, s) => s.sid))
    val extra = Seq(
      Assign("grp", lit(tag), (_, _) => tag),
      Assign("n", src("sv"), (_, s) => s.sv))
    base ++ r.shuffle(extra).take(r.nextInt(3))
  }

  private def sortKey(t: T): (Long, String, Long) = (
    if (t.id == null) Long.MinValue else t.id,
    if (t.grp == null) "\u0000" else t.grp,
    if (t.n == null) Long.MinValue else t.n)

  // r18 budget trim: 6 rounds by default, the full 20 tagged slow
  test("fuzz: 6 random clause cascades, CoW and MoR both match the reference") {
    clauseFuzz(6)
  }
  test("fuzz: 20 random clause cascades (slow)", graft.SlowTest) {
    clauseFuzz(20)
  }

  private def clauseFuzz(rounds: Int): Unit = {
    import spark.implicits._
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20250815L)
    val r = new scala.util.Random(seed)
    (1 to rounds).foreach { round =>
      // unique ids (MoR contract: keys identify rows), at most one null id
      val ids = r.shuffle((0 to 12).map(_.toLong).toVector).take(3 + r.nextInt(6))
      val target = ids.map(i => T(i,
          if (r.nextInt(5) == 0) null else s"g${r.nextInt(3)}",
          if (r.nextInt(6) == 0) null else r.nextInt(60).toLong)) ++
        (if (r.nextBoolean()) Seq(T(null, "nullrow", r.nextInt(60).toLong))
         else Seq.empty)
      val sids = r.shuffle((-2 to 14).map(_.toLong).toVector).take(2 + r.nextInt(6))
      val source = sids.map(i => S(i,
          if (r.nextInt(5) == 0) null else r.nextInt(60).toLong)) ++
        (if (r.nextBoolean()) Seq(S(null, 7L)) else Seq.empty)

      val matched: Seq[RefClause] = (0 until r.nextInt(4)).map { i =>
        if (r.nextInt(3) == 0) RDelete(condPoolMatched(r))
        else RUpdate(condPoolMatched(r), updateAssigns(r, s"U$round$i"))
      }
      val notMatched: Seq[RefClause] = (0 until r.nextInt(3)).map { i =>
        RInsert(condPoolSrc(r), insertValues(r, s"I$round$i"))
      }
      val nmbs: Seq[RefClause] = (0 until r.nextInt(3)).map { i =>
        if (r.nextInt(3) == 0) RDelete(condPoolTgt(r))
        else RUpdate(condPoolTgt(r), nmbsAssigns(r, s"S$round$i"))
      }

      val expected = reference(target, source, matched, notMatched, nmbs)
        .sortBy(sortKey)

      val tDF = spark.createDataFrame(
        spark.sparkContext.parallelize(target.map(t => Row(t.id, t.grp, t.n))),
        schema)
      val sDF = source.map(s =>
        (Option(s.sid).map(Long2long), Option(s.sv).map(Long2long)))
        .toDF("sid", "sv")

      def run(mor: Boolean): Seq[T] = {
        val tab = GraftTable.create(spark, tmpDir(s"mif-$round-$mor"),
          s"mif$round$mor", schema)
        if (target.nonEmpty) tab.append(tDF)
        if (mor) tab.mergeIntoMoR(sDF, Seq("id" -> col("sid")),
          matched.map(toClause), notMatched.map(toClause), nmbs.map(toClause))
        else tab.mergeInto(sDF, Seq("id" -> col("sid")),
          matched.map(toClause), notMatched.map(toClause), nmbs.map(toClause))
        tab.toDF.collect().map(row => T(
          if (row.isNullAt(0)) null else java.lang.Long.valueOf(row.getLong(0)),
          if (row.isNullAt(1)) null else row.getString(1),
          if (row.isNullAt(2)) null else java.lang.Long.valueOf(row.getLong(2))))
          .toSeq.sortBy(sortKey)
      }
      val ctx = s"round=$round seed=$seed matched=$matched " +
        s"notMatched=$notMatched nmbs=$nmbs target=$target source=$source"
      assert(run(mor = false) === expected, s"CoW diverged: $ctx")
      assert(run(mor = true) === expected, s"MoR diverged: $ctx")
    }
  }
}
