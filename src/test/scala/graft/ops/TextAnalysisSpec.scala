package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import TextAnalysis._

  private def one(textVal: String) = {
    import spark.implicits._
    Seq(Tuple1(textVal)).toDF("text")
  }

  test("vocabOverlap: pairwise Jaccard over distinct token sets") {
    import spark.implicits._
    // A vocab {a b c d}, B vocab {c d e f}, C vocab {a}:
    // A-B inter 2 union 6; A-C inter 1 union 4; B-C inter 0 union 5
    val docs = Seq(
      ("A", "a b c"), ("A", "c d"),
      ("B", "c d e"), ("B", "e f"),
      ("C", "a a a")).toDF("source", "text")
    val got = vocabOverlap(docs).orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("A", "B", 2L, 6L, 2.0 / 6),
      ("A", "C", 1L, 4L, 1.0 / 4),
      ("B", "C", 0L, 5L, 0.0)))
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

  test("unigramLmScore: hand-computed mean log-prob on a tiny corpus") {
    import spark.implicits._
    // corpus tokens: a a a b  -> p(a)=3/4, p(b)=1/4
    val df = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val got = unigramLmScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lnA = math.log(3.0 / 4.0); val lnB = math.log(1.0 / 4.0)
    def r4(x: Double) = math.round(x * 10000.0) / 10000.0
    assert(got(1L) === ((2L, r4(lnA))))
    assert(got(2L) === ((2L, r4((lnA + lnB) / 2.0))))
    // the all-common-token doc outscores the one with a rare token
    assert(got(1L)._2 > got(2L)._2)
  }

  test("tfidfTopTerms: shared terms score zero, distinctive terms rank first") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "shared alpha alpha"),
      (2L, "en", "shared alpha"),
      (3L, "de", "shared beta")).toDF("doc_id", "lang", "text")
    val rows = tfidfTopTerms(df, "text", "lang", "doc_id", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val en = rows.filter(_._1 == "en").sortBy(_._2)
    // alpha: tf=3 in en, df=2 of 3 docs -> 3*ln(1.5); shared: ln(1)=0
    assert(en.head._3 === "alpha" && en.head._4 === 3L && en.head._5 === 2L)
    assert(math.abs(en.head._6 - math.round(3 * math.log(3.0 / 2.0) * 1e4) / 1e4) < 1e-9)
    // 'shared' appears in every doc -> idf 0, ranked below alpha
    val de = rows.filter(_._1 == "de").sortBy(_._2)
    assert(de.head._3 === "beta")
    assert(rows.filter(t => t._3 == "shared").forall(_._6 === 0.0))
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

  test("bigramLmScore: hand-computed interpolated log-prob; ppl ranks oddballs") {
    import spark.implicits._
    // corpus: "a b" twice, "a c" once — T=6 unigrams
    // c1: a=3, b=2, c=1; c2: "a b"=2, "a c"=1
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df, "text", "doc_id", lambda = 0.7)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // doc 1: P(b|a) = 0.7*(2/3) + 0.3*(2/6); ln ≈ ln(0.56667) = -0.5680
    val pAB = 0.7 * (2.0 / 3.0) + 0.3 * (2.0 / 6.0)
    assert(out(0)._2 === 1L)
    assert(math.abs(out(0)._3 - BigDecimal(math.log(pAB))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // doc 3's "a c" is rarer than "a b": lower prob, higher perplexity
    assert(out(2)._3 < out(0)._3 && out(2)._4 > out(0)._4)
    // ppl = exp(-lm_score) up to the independent roundings
    assert(math.abs(out(0)._4 - math.exp(-math.log(pAB))) < 0.01)
  }

  test("bigramLmScore: unseen-bigram floor is finite; short docs drop out") {
    import spark.implicits._
    // docs 1/2 establish vocab; doc 3 pairs tokens never seen adjacent
    val df = Seq((1L, "x y z"), (2L, "z q"), (3L, "y x"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // "y x" never occurs... except in doc 3 itself — every in-corpus
    // bigram has c2 >= 1, and the unigram interpolation keeps the prob
    // strictly positive, so scores are always finite
    assert(out.forall(r => !r.getDouble(2).isInfinite && !r.getDouble(2).isNaN))
    // the single-token doc has no bigrams and is omitted
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
  }

  test("collocations matches an independent brute-force recount on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val vocabWords = Array("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(12))(vocabWords(rnd.nextInt(6))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val window = 2
    val got = TextAnalysis.collocations(df, "text", window, minCount = 1L, k = 10000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // independent recount: nested loops over the raw token sequences
    val toks = docs.map(_._2.split("\\s+").toSeq)
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    for (ts <- toks; i <- ts.indices; j <- (i + 1) to math.min(i + window, ts.size - 1)) {
      val p = if (ts(i) <= ts(j)) (ts(i), ts(j)) else (ts(j), ts(i))
      pairCounts(p) = pairCounts.getOrElse(p, 0L) + 1L
    }
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totTok = toks.map(_.size).sum.toDouble
    val totPairs = toks.map(ts => (1 to window).map(j => math.max(0, ts.size - j)).sum).sum.toDouble
    assert(got.keySet === pairCounts.keySet)
    pairCounts.foreach { case (p, n) =>
      assert(got(p)._1 === n, s"count mismatch for $p")
      val pmi = math.log((n / totPairs) / ((uni(p._1) / totTok) * (uni(p._2) / totTok)))
      assert(math.abs(got(p)._2 - pmi) < 1e-3, s"pmi mismatch for $p")
    }
  }

  test("zipfFit recovers an exact power law: slope -1, r2 1, exact TTR") {
    import spark.implicits._
    // freq(rank r) = 2520/r exactly (2520 divisible by 1..10):
    // ln(freq) = ln(2520) - ln(rank) -> slope -1, perfect fit
    val text = (1 to 10).flatMap(r => Seq.fill(2520 / r)(s"w$r")).mkString(" ")
    val df = Seq(Tuple1(text)).toDF("text")
    val row = TextAnalysis.zipfFit(df, "text", topN = 10).collect().head
    assert(row.getAs[Long]("n_terms") === 10L)
    assert(row.getAs[Double]("zipf_slope") === -1.0)
    assert(row.getAs[Double]("zipf_r2") === 1.0)
    assert(math.abs(row.getAs[Double]("zipf_intercept") - math.log(2520.0)) < 1e-3)
    val total = (1 to 10).map(2520 / _).sum
    assert(row.getAs[Long]("distinct_terms") === 10L)
    assert(row.getAs[Long]("total_tokens") === total.toLong)
    assert(row.getAs[Double]("ttr") ===
      BigDecimal(10.0 / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("unigramDivergence: zero on identical slices, positive asymmetric KL, hand-checked") {
    import spark.implicits._
    val same = Seq((1L, "a b c", "x"), (2L, "a b c", "y")).toDF("doc_id", "text", "g")
    val zero = TextAnalysis.unigramDivergence(same, "text", "g", "x", "y").collect().head
    assert(zero.getAs[Long]("n_terms") === 3L)
    assert(zero.getAs[Double]("kl_ab") === 0.0)
    assert(zero.getAs[Double]("js") === 0.0)

    // hand-computable: A = {a:2, b:1}, B = {a:1, b:2}; V=2
    // p = (3/5, 2/5), q = (2/5, 3/5) after +1 smoothing over N+V=5
    val df = Seq((1L, "a a b", "A"), (2L, "a b b", "B")).toDF("doc_id", "text", "g")
    val r = TextAnalysis.unigramDivergence(df, "text", "g", "A", "B").collect().head
    val (p1, p2) = (3.0 / 5, 2.0 / 5)
    val expected = BigDecimal(p1 * math.log(p1 / p2) + p2 * math.log(p2 / p1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("kl_ab") === expected)
    assert(r.getAs[Double]("kl_ba") === expected) // symmetric by construction here
    assert(r.getAs[Double]("js") > 0.0 && r.getAs[Double]("js") < math.log(2.0))

    // disjoint vocab under a tight topN still yields finite positive KLs
    val disj = Seq((1L, "aa aa aa", "A"), (2L, "zz zz", "B")).toDF("doc_id", "text", "g")
    val d = TextAnalysis.unigramDivergence(disj, "text", "g", "A", "B", topN = 2).collect().head
    assert(d.getAs[Long]("n_terms") === 2L)
    assert(d.getAs[Double]("kl_ab") > 0.0 && !d.getAs[Double]("kl_ab").isInfinite)
  }

  test("collocations: window semantics, canonical pair order, PMI value, minCount cut") {
    import spark.implicits._
    // "b a" occurrences give pair "a b" after canonical sort; "a ? c"
    // co-occurs only at distance 2 — included at window=2, and "a ... d"
    // at distance 3 must NOT appear
    val df = Seq(
      (1L, "b a x c q d"), // pairs d<=2 incl (a,x),(a,c via distance 2)...
      (2L, "b a"), (3L, "b a"), (4L, "b a")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(df, "text", window = 2,
      minCount = 4L, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // only ("a","b") survives minCount=4: once in doc1 + three pair docs
    assert(out.length === 1)
    val (ta, tb, nab, pmi) = out.head
    assert((ta, tb, nab) === (("a", "b", 4L)))
    // hand PMI: T=12 tokens, P=sum over docs of (n-1)+(n-2)=9+0+3*1... doc1:5+4=9, docs2-4: 1+0 each => P=12
    // n_a=4, n_b=4 => pmi = ln((4/12)/((4/12)*(4/12))) = ln(3)
    assert(math.abs(pmi - BigDecimal(math.log(3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // in doc1 "b a x c q d", q is distance 3 from a: excluded at window=2
    val all = TextAnalysis.collocations(df, "text", window = 2,
      minCount = 1L, k = 100).collect().map(r => (r.getString(0), r.getString(1)))
    assert(!all.contains(("a", "q")))
    // window=3 brings the distance-3 pair in; distance-4 (a,d) still out
    val w3 = TextAnalysis.collocations(df, "text", window = 3,
      minCount = 1L, k = 100).collect().map(r => (r.getString(0), r.getString(1)))
    assert(w3.contains(("a", "q")) && !w3.contains(("a", "d")))
  }

  test("bm25TopK: hand-checked score, self-retrieval, rank determinism") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple banana"),
      (3L, "durian elderberry fig grape"),
      (4L, "apple durian")).toDF("doc_id", "text")
    val queries = Seq((10L, "apple"), (30L, "durian fig")).toDF("qid", "qtext")
    val got = TextAnalysis.bm25TopK(docs, "text", "doc_id",
        queries, "qid", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // hand score for query "apple", doc 4 ("apple durian"): N=4, df=3,
    // idf = ln(1 + 1.5/3.5); tf=1, dl=2, avgdl=3 =>
    // denom = 1 + 1.2*(0.25 + 0.75*2/3) = 1.9, contrib = idf*2.2/1.9
    val idf = math.log(1.0 + 1.5 / 3.5)
    val expected4 = idf * 2.2 / 1.9
    val d4 = got.find(r => r._1 == 10L && r._3 == 4L).get._4
    assert(math.abs(d4 - expected4) < 1e-9)

    // "apple" ranks doc2 (tf=2) above docs 1 and 4 (tf=1); shorter doc 4
    // beats the longer doc 1 at equal tf (length normalization)
    val q10 = got.filter(_._1 == 10L).sortBy(_._2).map(_._3).toSeq
    assert(q10 === Seq(2L, 4L, 1L))

    // multi-term query: doc3 matches both terms and must rank first;
    // doc4 (durian only) second; nothing else matches
    val q30 = got.filter(_._1 == 30L).sortBy(_._2).map(_._3).toSeq
    assert(q30 === Seq(3L, 4L))

    // deterministic across re-runs
    val again = TextAnalysis.bm25TopK(docs, "text", "doc_id",
        queries, "qid", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.sortBy(r => (r._1, r._2)).toSeq === again.sortBy(r => (r._1, r._2)).toSeq)

    // duplicated query terms collapse (bag-of-words query semantics)
    val dup = TextAnalysis.bm25TopK(docs, "text", "doc_id",
        Seq((10L, "apple apple apple")).toDF("qid", "qtext"), "qid", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(dup.toSeq === got.filter(_._1 == 10L).toSeq)
  }
}
