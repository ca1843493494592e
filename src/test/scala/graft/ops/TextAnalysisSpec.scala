package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import TextAnalysis._

  private def one(textVal: String) = {
    import spark.implicits._
    Seq(Tuple1(textVal)).toDF("text")
  }

  test("tokenCount and bpeTokenCount") {
    val r = one("Hello, world! It's 42 degrees.")
      .select(tokenCount(col("text")).as("ws"), bpeTokenCount(col("text")).as("bpe"))
      .collect().head
    assert(r.getAs[Int]("ws") === 5)
    // hello , world ! it ' s 42 degrees . -> 10
    assert(r.getAs[Int]("bpe") === 10)
  }

  test("shingles") {
    val r = one("a b c d")
      .select(shingles(col("text"), 2).as("s"))
      .collect().head.getSeq[String](0)
    assert(r === Seq("a b", "b c", "c d"))
    val short = one("a")
      .select(shingles(col("text"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(short === Seq.empty)
  }

  test("langId picks the best marker set, und when nothing hits") {
    val df = {
      import spark.implicits._
      Seq(
        ("the cat and the dog of a house", "en"),
        ("el perro de la casa y los gatos", "es"),
        ("le chien et les chats des villes", "fr"),
        ("der hund und die katze mit ein buch", "de"),
        ("zzz qqq www", "und")
      ).toDF("text", "expected")
    }
    val got = df.select(col("expected"), langId(col("text")).as("got")).collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0), r.toString))
  }

  test("qualityScore is in [0,1] and favors proper text") {
    val r = {
      import spark.implicits._
      Seq(
        ("good", "The quick brown fox jumps over the lazy dog and keeps running through the field of tall grass."),
        ("junk", "@@@@ #### !!!! 1234 %%%% ^^^^ &&&& ****")
      ).toDF("kind", "text")
    }.select(col("kind"), qualityScore(col("text")).as("q"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(r("good") > r("junk"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val r = {
      import spark.implicits._
      Seq(("a", "Hello   World"), ("b", " hello world "), ("c", "hello worlds"))
        .toDF("id", "text")
    }.select(col("id"), fingerprint(col("text")).as("f"))
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r("a") === r("b"))
    assert(r("a") !== r("c"))
  }

  test("repetitionSignals: exact fractions on hand-computable docs") {
    val df = {
      import spark.implicits._
      Seq(
        // 4 tokens, 2 distinct; "spam spam" bigram occurs 2 of 3
        (1L, "spam spam spam eggs"),
        // all distinct tokens, every bigram unique
        (2L, "one two three four"),
        // single token: no bigrams at all
        (3L, "solo")
      ).toDF("doc_id", "text")
    }
    val r = TextAnalysis.repetitionSignals(df, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r(0) === ((1L, 4L, 0.5, 0.75, 0.6667)))
    assert(r(1) === ((2L, 4L, 0.0, 0.25, 0.3333)))
    assert(r(2) === ((3L, 1L, 0.0, 1.0, 0.0)))
  }

  test("filterRepetitive drops the degenerate docs, keeps the rest") {
    val df = {
      import spark.implicits._
      Seq(
        (1L, "spam spam spam spam spam spam spam spam"),
        (2L, "a perfectly ordinary sentence with distinct words throughout"),
        (3L, "ok ok ok ok ok go go go go go") // dup_token_frac = 0.8
      ).toDF("doc_id", "text")
    }
    val kept = TextAnalysis.filterRepetitive(df, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(2L))
  }
}
