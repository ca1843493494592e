package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Parity of the native [[TokenPairs]] emitter against the HOF chain it
  * replaced in TextAnalysis.collocations — value AND order identical. */
class TokenPairsSpec extends SparkTestBase {

  private def hofPairs(window: Int) = {
    val n = size(col("__toks"))
    val perJ = (1 to window).map { j =>
      when(n > j,
        zip_with(slice(col("__toks"), lit(1), n - j),
          slice(col("__toks"), lit(j + 1), n - j),
          (a, b) => concat_ws(" ", array_sort(array(a, b)))))
        .otherwise(array().cast("array<string>"))
    }
    concat(perJ: _*)
  }

  test("token_pairs == the zip_with/array_sort/concat_ws chain, order included") {
    import spark.implicits._
    val r = new scala.util.Random(17)
    val vocab = Seq("alpha", "beta", "gamma", "zz", "a", "", "Ä", "é-x")
    val docs = (1 to 60).map { i =>
      (i.toLong, Seq.fill(r.nextInt(9))(vocab(r.nextInt(vocab.size))))
    }.toDF("id", "__toks")
    for (w <- 1 to 3) {
      val rows = docs.select(col("id"), hofPairs(w).as("h"),
        GraftFunctions.token_pairs(col("__toks"), w).as("n")).collect()
      rows.foreach { row =>
        assert(row.getSeq[String](1) === row.getSeq[String](2),
          s"id=${row.getLong(0)} window=$w")
      }
    }
  }

  test("empty and single-token inputs emit no pairs; null tokens -> null") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq.empty[String])), (2L, Some(Seq("only"))),
      (3L, Option.empty[Seq[String]])).toDF("id", "__toks")
    val rows = df.select(col("id"),
      GraftFunctions.token_pairs(col("__toks"), 2).as("p")).collect()
    assert(rows(0).getSeq[String](1) === Seq.empty)
    assert(rows(1).getSeq[String](1) === Seq.empty)
    assert(rows(2).isNullAt(1))
  }

  test("null elements are skipped without NPE (tokenizers never emit them)") {
    import spark.implicits._
    val df = Seq((1L, Seq(Some("a"), None, Some("b")))).toDF("id", "__toks")
    val got = df.select(GraftFunctions.token_pairs(col("__toks"), 2).as("p"))
      .head.getSeq[String](0)
    // pairs not involving the null slot survive: (a,b) at distance 2
    assert(got === Seq("a b"))
  }

  test("collocations over a hand-checked corpus is unchanged") {
    import spark.implicits._
    val docs = Seq(
      "the quick fox the quick fox", "the quick fox jumps",
      "quick fox the fox", "the quick the quick the quick")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.collocations(docs, "text",
        window = 2, minCount = 3L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // sequential reference count over the same corpus
    val texts = Seq(
      "the quick fox the quick fox", "the quick fox jumps",
      "quick fox the fox", "the quick the quick the quick")
    val expected = texts.flatMap { t =>
      val toks = t.split("\\s+").toSeq
      for (j <- 1 to 2; i <- 0 until math.max(0, toks.size - j))
        yield Seq(toks(i), toks(i + j)).sorted.mkString(" ")
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 3L).toMap
    val counts = got.map(p => s"${p._1} ${p._2}" -> p._3).toMap
    expected.foreach { case (pair, n) =>
      assert(counts.get(pair).contains(n), s"pair $pair: got ${counts.get(pair)}")
    }
    assert(counts.keySet === expected.keySet)
  }
}
