package graft.functions

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Interpreted-vs-codegen parity for every native expression.
 *
 * Each custom Catalyst expression carries BOTH an interpreted path
 * (`nullSafeEval`) and a generated one (`doGenCode`); a divergence between
 * them is a silent correctness bug that only shows up when a plan happens
 * to fall out of whole-stage codegen (wide schemas, fallback mode,
 * interpreted-only contexts). This spec runs the same seeded-random input
 * frame through `factoryMode=NO_CODEGEN, wholeStage=false` and
 * `factoryMode=CODEGEN_ONLY, wholeStage=true` and requires bit-identical
 * results — doubles compared via raw bits, so a NaN-vs-NaN or -0.0-vs-0.0
 * drift fails too. CODEGEN_ONLY additionally proves every doGenCode
 * actually compiles (no silent fallback).
 *
 * Inputs deliberately include the nasty cases: empty/huge strings, full
 * unicode (multi-byte + surrogate pairs), nulls, empty arrays, mismatched
 * lengths, +-Infinity, NaN, +-0.0, Long.Min/MaxValue.
 */
class CodegenParitySpec extends SparkTestBase {

  private def bits(v: Any): Any = v match {
    case d: Double => java.lang.Double.doubleToRawLongBits(d)
    case f: Float => java.lang.Float.floatToRawIntBits(f)
    case x => x
  }

  /** Collect `df` under forced-interpreted and forced-codegen modes and
    * assert bitwise-identical rows. */
  private def assertParity(df: => DataFrame, label: String): Unit = {
    def collect(mode: String, ws: Boolean): Seq[Seq[Any]] =
      try {
        spark.conf.set("spark.sql.codegen.factoryMode", mode)
        spark.conf.set("spark.sql.codegen.wholeStage", ws.toString)
        df.collect().toSeq.map(r => r.toSeq.map(bits))
      } finally {
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
    val interp = collect("NO_CODEGEN", ws = false)
    val gen = collect("CODEGEN_ONLY", ws = true)
    assert(interp.size == gen.size, s"$label: row count diverged")
    interp.zip(gen).zipWithIndex.foreach { case ((i, g), idx) =>
      assert(i == g, s"$label row $idx: interpreted=$i codegen=$g")
    }
  }

  private val rnd = new Random(42)

  private def randString(max: Int): String = {
    val n = rnd.nextInt(max)
    val sb = new StringBuilder
    while (sb.length < n) {
      rnd.nextInt(4) match {
        case 0 => sb.append((rnd.nextInt(95) + 32).toChar) // ascii
        case 1 => sb.append((rnd.nextInt(0x700) + 0x80).toChar) // 2-byte utf8
        case 2 => sb.append((rnd.nextInt(0x8000) + 0x800).toChar) // 3-byte
        case _ => sb.appendAll(Character.toChars(0x10000 + rnd.nextInt(0xFFF))) // surrogate pair
      }
    }
    sb.toString
  }

  private val specialDoubles = Seq(0.0, -0.0, Double.NaN,
    Double.PositiveInfinity, Double.NegativeInfinity, Double.MinPositiveValue)

  private def randFloats(max: Int): Seq[Float] =
    Seq.fill(rnd.nextInt(max))(
      if (rnd.nextInt(10) == 0) specialDoubles(rnd.nextInt(specialDoubles.size)).toFloat
      else (rnd.nextDouble() * 2 - 1).toFloat)

  private def randDoubles(max: Int): Seq[Double] =
    Seq.fill(rnd.nextInt(max))(
      if (rnd.nextInt(10) == 0) specialDoubles(rnd.nextInt(specialDoubles.size))
      else rnd.nextDouble() * 2 - 1)

  private def randLongs(max: Int): Seq[Long] =
    Seq.fill(rnd.nextInt(max))(rnd.nextInt(5) match {
      case 0 => Long.MinValue + rnd.nextInt(3)
      case 1 => Long.MaxValue - rnd.nextInt(3)
      case _ => rnd.nextLong()
    })

  test("rolling_hash, char_entropy, nfc_normalize: strings incl unicode, empty, null") {
    import spark.implicits._
    val rows: Seq[Option[String]] =
      Seq(None, Some(""), Some("a" * 10000),
        Some("café Å"), Some("́")) ++ // decomposed + lone mark
        (1 to 300).map(_ => Some(randString(80)))
    val df = rows.toDF("s")
      .select(GraftFunctions.rolling_hash(col("s")).as("h"),
        GraftFunctions.char_entropy(col("s")).as("e"),
        GraftFunctions.nfc_normalize(col("s")).as("n"))
    assertParity(df, "rolling_hash/char_entropy/nfc_normalize")
  }

  test("shingles: widths 1-4 over random token arrays incl empty, unicode, null") {
    import spark.implicits._
    val rows: Seq[Option[Seq[String]]] =
      Seq(None, Some(Seq.empty), Some(Seq("one")),
        Some(Seq("a", "b", "c", "d", "e")),
        Some(Seq("café", "Å", "", "𝒳"))) ++
        (1 to 200).map(_ => Some(Seq.fill(rnd.nextInt(12))(randString(6))))
    val df = rows.toDF("t")
      .select((1 to 4).map(n =>
        GraftFunctions.shingles(col("t"), n).as(s"s$n")): _*)
    assertParity(df, "shingles")
    // semantic pin vs the textbook definition on one concrete case
    val got = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(GraftFunctions.shingles(col("t"), 2)).collect().head.getSeq[String](0)
    assert(got === Seq("a b", "b c", "c d"))
  }

  test("nfc_normalize: canonical composition vectors + ASCII identity") {
    import spark.implicits._
    val rows = Seq(
      "café", // e + combining acute -> precomposed é
      "Å", // ANGSTROM SIGN singleton -> U+00C5 Å
      "Å", // A + combining ring -> Å
      "ḍ̇", // d-dot-above + dot-below -> reordered/composed
      "plain ascii stays byte-identical")
    val out = rows.toDF("s")
      .select(GraftFunctions.nfc_normalize(col("s")).as("n"))
      .as[String].collect()
    assert(out(0) === "café")
    assert(out(1) === "Å")
    assert(out(2) === "Å")
    assert(out(3) === java.text.Normalizer.normalize("ḍ̇",
      java.text.Normalizer.Form.NFC))
    assert(out(4) === "plain ascii stays byte-identical")
  }

  test("vec_cosine and vec_l2: float and double arrays, specials, mismatched, null") {
    import spark.implicits._
    val rows: Seq[(Option[Seq[Float]], Option[Seq[Float]])] =
      Seq((None, Some(Seq(1f))), (Some(Seq.empty[Float]), Some(Seq(1f, 2f)))) ++
        (1 to 300).map(_ => (Some(randFloats(65)), Some(randFloats(65))))
    val f = rows.toDF("a", "b")
      .select(GraftFunctions.vec_cosine(col("a"), col("b")).as("c"),
        GraftFunctions.vec_l2(col("a"), col("b")).as("d"))
    assertParity(f, "vec_cosine/vec_l2 float")
    val drows: Seq[(Option[Seq[Double]], Option[Seq[Double]])] =
      (1 to 200).map(_ => (Some(randDoubles(65)), Some(randDoubles(65))))
    val d = drows.toDF("a", "b")
      .select(GraftFunctions.vec_cosine(col("a"), col("b")).as("c"),
        GraftFunctions.vec_l2(col("a"), col("b")).as("d"))
    assertParity(d, "vec_cosine/vec_l2 double")
  }

  test("wrapping_affine: full long range incl Min/MaxValue, null") {
    import spark.implicits._
    val rows: Seq[Option[Long]] = Seq(None) ++
      (1 to 300).map(_ => Some(randLongs(2).headOption.getOrElse(0L))) ++
      Seq(Some(Long.MinValue), Some(Long.MaxValue), Some(0L), Some(-1L))
    val df = rows.toDF("x")
      .select(GraftFunctions.wrapping_affine(col("x"), 6364136223846793005L, 1442695040888963407L).as("y"),
        GraftFunctions.wrapping_affine(col("x"), -7L, Long.MaxValue).as("z"))
    assertParity(df, "wrapping_affine")
  }

  test("simhash64 and array_eq_count: long arrays incl empty, extremes, null") {
    import spark.implicits._
    val rows: Seq[(Option[Seq[Long]], Option[Seq[Long]])] =
      Seq((None, Some(Seq(1L))), (Some(Seq.empty[Long]), Some(Seq.empty[Long]))) ++
        (1 to 300).map { _ =>
          val a = randLongs(40)
          // force some positional equality so eq-count exercises both branches
          val b = if (rnd.nextBoolean() && a.nonEmpty)
            a.updated(rnd.nextInt(a.size), rnd.nextLong()) else randLongs(40)
          (Some(a), Some(b))
        }
    val df = rows.toDF("a", "b")
      .select(GraftFunctions.simhash64(col("a")).as("s"),
        GraftFunctions.array_eq_count(col("a"), col("b")).as("n"))
    assertParity(df, "simhash64/array_eq_count")
  }

  test("hyperplane_sig: float vectors vs a fixed coefficient matrix") {
    import spark.implicits._
    val coeffs = Seq.tabulate(16, 32)((p, d) =>
      math.sin(p * 131 + d * 17) * 2 - 0.5) // deterministic, sign-mixed
    val rows: Seq[Option[Seq[Float]]] = Seq(None, Some(Seq.empty[Float])) ++
      (1 to 300).map(_ => Some(randFloats(33)))
    val df = rows.toDF("v")
      .select(GraftFunctions.hyperplane_sig(col("v"), coeffs).as("sig"))
    assertParity(df, "hyperplane_sig")
  }
}
