package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
      (4L, "completely different content about spark engines"),
      (5L, "  The Quick  Brown Fox jumps over the lazy dog "), // normalized dup of 1
      (6L, "unrelated text mentioning neither foxes nor dogs at all")
    ).toDF("doc_id", "text")
  }

  test("exactDedup keeps lowest id per normalized text") {
    val kept = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L, 6L)) // 2 and 5 collapse into 1
  }

  test("exactDedupBest keeps the highest-scored duplicate, ties to lowest id") {
    import spark.implicits._
    val scored = docs.withColumn("score",
      when(col("doc_id") === 5L, 10L).otherwise(col("doc_id")))
    // group {1,2,5}: 5 has the top score and wins; singletons keep themselves
    val kept = Dedup.exactDedupBest(scored, "text", "score", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(3L, 4L, 5L, 6L))
    // equal scores fall back to exactDedup's lowest-id policy
    val tied = Dedup.exactDedupBest(docs.withColumn("score", lit(1L)),
      "text", "score", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(tied.toSeq === Seq(1L, 3L, 4L, 6L))
  }

  test("exactDupGroups reports group size and keeper") {
    val g = Dedup.exactDupGroups(docs, "text", "doc_id").collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("group_size") === 3)
    assert(g.head.getAs[Long]("keeper_id") === 1)
  }

  test("incrementalDedup drops known content, then self-dedups the batch") {
    import spark.implicits._
    val corpus = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(docs, corpus, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 1, 2, 5 are (normalized) dups of corpus content; 3, 4, 6 are fresh
    assert(kept.toSeq === Seq(3L, 4L, 6L))
    // an empty corpus degrades to plain exactDedup
    val noCorpus = Dedup.incrementalDedup(docs, corpus.limit(0), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(noCorpus.toSeq === Seq(1L, 3L, 4L, 6L))
  }

  test("jaccard column math") {
    import spark.implicits._
    val r = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
      .collect().head.getDouble(0)
    assert(math.abs(r - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}|
  }

  test("minhash signature: identical texts get identical signatures") {
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", k = 16, shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) === sigs(5L)) // normalization folds case/whitespace
    assert(sigs(1L) !== sigs(4L))
    assert(sigs.values.head.size === 16)
  }

  test("minhashNearDups finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
      threshold = 0.5, k = 16, bands = 8, shingleN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)))
    assert(pairs.contains((2L, 5L)))
    // doc 3 differs by one token -> high but sub-1.0 jaccard; must pair with 1
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 6L || b == 6L })
  }

  test("ngramJaccardPairs brute force matches hand arithmetic") {
    val got = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // docs 1/2/5: identical word sets -> 1.0
    assert(got((1L, 2L)) === 1.0)
    assert(got((1L, 5L)) === 1.0)
    // 1 vs 3: words {the,quick,brown,fox,jumps,over,lazy,dog} vs same minus dog plus cat
    // |inter|=7, |union|=9 -> 0.7778
    assert(got((1L, 3L)) === 0.7778)
    assert(!got.contains((1L, 4L)))
  }

  test("simhash: identical texts equal, near texts close, distant texts far") {
    val fp = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
  }

  test("simhashNearDups bucketing finds identical pairs") {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)))
  }

  test("simhashNearDups equals the brute-force cross join (pigeonhole recall)") {
    // the recall guarantee is exact: banded output must EQUAL brute force,
    // not approximate it — checked on real corpus data at two maxDist values
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (maxDist <- Seq(3, 7)) {
      val banded = Dedup.simhashNearDups(real, "text", "doc_id", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val fps = Dedup.simhash(real, "text", "doc_id")
      val a = fps.select(col("doc_id").as("id_a"), col("simhash").as("fp_a"))
      val b = fps.select(col("doc_id").as("id_b"), col("simhash").as("fp_b"))
      val brute = a.crossJoin(b)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.hamming(col("fp_a"), col("fp_b")).as("hamming_dist"))
        .filter(col("hamming_dist") <= maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded === brute, s"maxDist=$maxDist")
      assert(brute.nonEmpty, s"maxDist=$maxDist should find near-dups in the corpus")
    }
  }

  test("connectedComponents labels every node with its min reachable id") {
    import spark.implicits._
    // two components: {1,2,3,7} (chain 7-3, 3-2, 2-1) and {10,11}; 20-20 self loop
    val pairs = Seq((7L, 3L), (3L, 2L), (2L, 1L), (10L, 11L), (20L, 20L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents converges on a long chain within the bound") {
    import spark.implicits._
    // worst-case diameter: a 12-node path; propagation needs ~11 rounds
    val chain = (1 until 12).map(i => (i.toLong + 1, i.toLong)).toDF("id_a", "id_b")
    // localThreshold = 0 forces the iterative loop — this test pins the
    // LOOP's convergence behavior, which the small-graph fast path would
    // otherwise bypass
    val comps = Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 15,
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size === 12 && comps.values.forall(_ == 1L))
    // and fails loudly when the bound is too small for the diameter
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 2,
        localThreshold = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("small-graph fast path matches the iterative loop exactly") {
    import spark.implicits._
    // irregular multi-component graph incl. a chain, a star, a self-loop,
    // and duplicate edges in both orientations
    val pairs = Seq((7L, 3L), (3L, 2L), (2L, 1L), (1L, 2L), (10L, 11L),
      (11L, 12L), (12L, 10L), (20L, 20L), (30L, 31L), (30L, 32L), (30L, 33L))
      .toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val loop = Dedup.connectedComponents(pairs, "id_a", "id_b",
        localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast.nonEmpty)
    assert(fast === loop)
  }

  test("fast-path vs loop CC equivalence holds on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    (1 to 5).foreach { trial =>
      val nNodes = 30 + rnd.nextInt(120)
      val nEdges = 10 + rnd.nextInt(200)
      val pairs = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .toDF("id_a", "id_b")
      val fast = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val loop = Dedup.connectedComponents(pairs, "id_a", "id_b",
          maxIter = 50, localThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(fast === loop, s"trial $trial: nodes=$nNodes edges=$nEdges")
    }
  }

  test("nearDupDedup keeps one representative per cluster plus unpaired docs") {
    val kept = Dedup.nearDupDedup(docs, "text", "doc_id", threshold = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // {1,2,3,5} cluster at J>=0.4 -> keep 1; 4 and 6 unpaired -> kept
    assert(kept === Set(1L, 4L, 6L))
  }

  test("keepRepresentatives applies the same keep rule to an explicit pair list") {
    import spark.implicits._
    val rows = Seq.tabulate(6)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    // components: {0,1,2} (chain) and {4,5}; 3 unpaired
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.keepRepresentatives(rows, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 3L, 4L))
  }

  test("duplicatedSpanStats flags cross-doc spans, not within-doc repeats") {
    import spark.implicits._
    val d = Seq(
      // docs 10/11 share the 4-token span "a b c d" inside distinct text
      (10L, "a b c d unique tail ten"),
      (11L, "prefix eleven a b c d"),
      // doc 12 repeats its own span twice but shares nothing cross-doc:
      // within-doc repetition must NOT count as duplication
      (12L, "x1 y1 z1 w1 x1 y1 z1 w1"),
      // doc 13 is shorter than the window: 0/0 row, dup_frac 0
      (13L, "too short")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(d, "text", "doc_id", window = 4)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 10: 4 windows, 1 duplicated ("a b c d")
    assert(out(0) === ((10L, 4L, 1L, 0.25)))
    // doc 11: 3 windows, 1 duplicated
    assert(out(1) === ((11L, 3L, 1L, 0.3333)))
    // doc 12: 5 windows ("x1 y1 z1 w1" twice, and the 3 wrap spans), none
    // duplicated cross-doc
    assert(out(2) === ((12L, 5L, 0L, 0.0)))
    assert(out(3) === ((13L, 0L, 0L, 0.0)))
  }

  test("spanNoveltyStats: later doc pays for shared spans, first doc stays novel") {
    import spark.implicits._
    val d = Seq(
      (10L, "a b c d unique tail ten"),      // first occurrence of "a b c d"
      (11L, "prefix eleven a b c d"),        // seen span: min doc 10 < 11
      (12L, "x1 y1 z1 w1 x1 y1 z1 w1"),      // self-repeats only: fully novel
      (13L, "too short")                     // 0 windows -> novelty 1.0
    ).toDF("doc_id", "text")
    val out = Dedup.spanNoveltyStats(d, "text", "doc_id", window = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((10L, 4L, 0L, 1.0)))      // first doc: nothing earlier
    assert(out(1) === ((11L, 3L, 1L, 0.6667)))   // one of 3 spans seen in doc 10
    assert(out(2) === ((12L, 5L, 0L, 1.0)))      // within-doc repeat is not "seen"
    assert(out(3) === ((13L, 0L, 0L, 1.0)))
  }

  test("span stats emit one row per DISTINCT id even when the input repeats ids") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e"),
      (1L, "a b c d e"), // repeated id: counts combine, row does not multiply
      (2L, "a b c d f")
    ).toDF("doc_id", "text")
    val dup = Dedup.duplicatedSpanStats(d, "text", "doc_id", window = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dup.size === 2)
    // doc 1 contributes 2x2 windows; "a b c d" is cross-doc duplicated
    assert(dup(1L) === ((4L, 2L)) && dup(2L) === ((2L, 1L)))
    val nov = Dedup.spanNoveltyStats(d, "text", "doc_id", window = 4)
      .collect().map(_.getLong(0))
    assert(nov.sorted.toSeq === Seq(1L, 2L))
  }

  test("duplicatedSpanStats: exact dup docs are 100% covered both sides") {
    val out = Dedup.duplicatedSpanStats(docs, "text", "doc_id", window = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    // 1, 2 and 5 normalize to identical text: every window duplicated
    assert(out(1L) === 1.0 && out(2L) === 1.0 && out(5L) === 1.0)
    // 3 differs from 1 only in the last token: all but the dog/cat-bearing
    // windows are shared, so coverage is strictly between 0 and 1
    assert(out(3L) > 0.0 && out(3L) < 1.0)
    assert(out(4L) === 0.0 && out(6L) === 0.0)
  }

  test("tfidfCosinePairs: idf weighting, maxDf pruning, postings join (no doc x doc)") {
    import spark.implicits._
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "q r"))
      .toDF("doc_id", "text")
    val got = Dedup.tfidfCosinePairs(d, "text", "doc_id",
      threshold = 0.05, shingleN = 1, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical docs -> cosine 1; doc 4 shares nothing -> absent
    assert(got((1L, 2L)) === 1.0)
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // hand value for (1,3): only x shared, idf-downweighted vs y/z
    val (wx, wy, wz) = (math.log(4.0 / 3), math.log(4.0 / 2), math.log(4.0 / 1))
    val expect13 = wx * wx /
      (math.sqrt(wx * wx + wy * wy) * math.sqrt(wx * wx + wz * wz))
    assert(math.abs(got((1L, 3L)) - expect13) < 1e-3)
    // maxDf=2 prunes x (df=3): (1,3) loses its only shared term; the
    // identical pair still scores 1 through y
    val pruned = Dedup.tfidfCosinePairs(d, "text", "doc_id",
      threshold = 0.05, shingleN = 1, maxDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned === Set((1L, 2L)))
    // candidate pairs meet through term postings (an equi-join on the
    // term key), never a doc-product join; the only nested-loop join in
    // the plan is the single-row broadcast of the N-docs scalar
    val plan = Dedup.tfidfCosinePairs(d, "text", "doc_id", 0.05, 1, 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"tfidf cosine must not plan a product join:\n$plan")
    assert(plan.contains("Join [__term") || plan.contains("Join [coalesce(__term")
      || plan.contains("HashJoin [__term"),
      s"expected the postings equi-join on the term key:\n$plan")
  }

  test("jaccardPrefixJoin equals brute force at several thresholds (lossless prefix filter)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0.5, 0.8, 0.9); n <- Seq(1, 3)) {
      val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", t, n)
        .orderBy("id_a", "id_b").collect().toSeq
      val prefix = Dedup.jaccardPrefixJoin(docs, "text", "doc_id", t, n)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(prefix === exact,
        s"prefix join must reproduce brute force at t=$t n=$n: " +
          s"${prefix.size} vs ${exact.size} pairs")
    }
  }

  test("jaccardPrefixJoin: randomized equivalence incl. threshold-boundary sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(1207)
    // small vocab forces heavy overlap; sizes 9/10 sit exactly on the
    // t=0.9 size-ratio boundary the epsilon guard protects
    val base = (0L until 120L).map { i =>
      val len = 9 + rnd.nextInt(3)
      (i, Seq.fill(len)(s"w${rnd.nextInt(18)}").mkString(" "))
    }
    // planted near-dups: exact copy (J=1) and a 9-of-10-token overlap pair
    // whose sizes 9/10 sit exactly on the t=0.9 size-ratio boundary the
    // epsilon guard protects
    val planted = Seq(
      (200L, base.head._2), // dup of doc 0
      (201L, (1 to 10).map(i => s"p$i").mkString(" ")),
      (202L, (1 to 9).map(i => s"p$i").mkString(" ")))
    val docs = (base ++ planted).toDF("doc_id", "text")
    for (t <- Seq(0.6, 0.9)) {
      val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", t, 1)
        .orderBy("id_a", "id_b").collect().toSeq
      val prefix = Dedup.jaccardPrefixJoin(docs, "text", "doc_id", t, 1)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(prefix === exact, s"t=$t: ${prefix.size} vs ${exact.size}")
      assert(exact.nonEmpty, s"fuzz should generate qualifying pairs at t=$t")
    }
  }

  test("jaccardPrefixJoin candidate generation never plans a cartesian product") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.jaccardPrefixJoin(docs, "text", "doc_id", 0.8, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"prefix join must stay an equi-join on shingles:\n$plan")
  }

  test("contentDefinedChunks: lossless reconstruction, consecutive ids, boundary rule matches md5") {
    import spark.implicits._
    val text = (1 to 400).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Dedup.contentDefinedChunks(d, "text", "doc_id", avgTokens = 8)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // chunk ids are consecutive from 0 and the chunks concatenate back to
    // the normalized text — nothing lost, nothing reordered
    assert(chunks.map(_._1).toSeq === chunks.indices.map(_.toLong))
    assert(chunks.map(_._2).mkString(" ") === text)
    assert(chunks.map(_._3).sum === 400L)
    assert(chunks.length > 1, "400 tokens at 1/8 boundary rate must split")
    // boundary rule: a chunk ends exactly where its last token's md5
    // starts below the threshold (except the final tail chunk)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def marker(tok: String): Boolean = {
      val hex = mdig.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.substring(0, 2) < "20"
    }
    chunks.dropRight(1).foreach { case (_, txt, _) =>
      assert(marker(txt.split(" ").last), s"non-tail chunk must end at a marker: '$txt'") }
    chunks.dropRight(1).foreach { case (_, txt, _) =>
      assert(!txt.split(" ").dropRight(1).exists(marker),
        s"no interior marker allowed inside a chunk: '$txt'") }
  }

  test("contentDefinedChunks are shift-resistant: a prefix edit re-aligns after one boundary") {
    import spark.implicits._
    val base = (1 to 300).map(i => s"tok$i")
    val d = Seq(
      (1L, base.mkString(" ")),
      (2L, ("injected " + base.mkString(" ")))
    ).toDF("doc_id", "text")
    val byDoc = Dedup.contentDefinedChunks(d, "text", "doc_id", avgTokens = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(2)).toSet }
    val a = byDoc(1L)
    val b = byDoc(2L)
    // every chunk of the original except (at most) the first survives the
    // prefix insertion verbatim — fixed-size chunking would share NONE
    assert((a -- b).size <= 1,
      s"at most the leading chunk may differ, got ${(a -- b).size} missing")
    assert(a.size > 3, "enough chunks for the property to be meaningful")
  }

  test("maximalRepeatedSpans: repeats straddling window boundaries merge to ONE maximal span") {
    import spark.implicits._
    def toks(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    // a 10-token verbatim repeat planted at different offsets in two docs
    // (k=4 → it covers 7 consecutive windows in each; the merge must
    // reassemble exactly [start, start+9] — no fixed-window fragments)
    val repeat = toks("r", 10)
    val d = Seq(
      (1L, s"${toks("a", 3)} $repeat ${toks("b", 5)}"), // repeat at pos 4..13
      (2L, s"${toks("c", 6)} $repeat"),                 // repeat at pos 7..16
      // doc 3: within-doc repeat of a 5-token run, twice back to back
      // with a separator — BOTH occurrences are maximal spans (ExactSubstr
      // counts any second occurrence, same-doc included)
      (3L, s"${toks("s", 5)} mid ${toks("s", 5)}"),     // pos 1..5 and 7..11
      (4L, toks("u", 30))                                // all unique: no rows
    ).toDF("doc_id", "text")
    val got = Dedup.maximalRepeatedSpans(d, "text", "doc_id", k = 4)
      .orderBy("doc_id", "start_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 4L, 13L, 10L), (2L, 7L, 16L, 10L),
      (3L, 1L, 5L, 5L), (3L, 7L, 11L, 5L)))
  }

  test("maximalRepeatedSpans: two separate repeats in one doc stay two spans") {
    import spark.implicits._
    // shared runs A (6 tokens) and B (5 tokens) both appear in doc 1 and
    // doc 2, separated by unique text — islands must not bridge the gap
    val a = "a1 a2 a3 a4 a5 a6"
    val b = "b1 b2 b3 b4 b5"
    val d = Seq(
      (1L, s"$a x1 x2 x3 $b"),      // A at 1..6, B at 10..14
      (2L, s"y1 $b y2 y3 $a")       // B at 2..6, A at 9..14
    ).toDF("doc_id", "text")
    val got = Dedup.maximalRepeatedSpans(d, "text", "doc_id", k = 4)
      .orderBy("doc_id", "start_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 1L, 6L, 6L), (1L, 10L, 14L, 5L),
      (2L, 2L, 6L, 5L), (2L, 9L, 14L, 6L)))
  }

  test("maximalRepeatedSpans: randomized equivalence vs a brute-force reference") {
    import spark.implicits._
    // small alphabet forces plenty of genuine repeats; brute force marks
    // covered positions by direct window comparison, then merges runs
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 4) {
      val k = 2 + rnd.nextInt(3) // 2..4
      val docs = (1L to 6L).map { id =>
        val len = 4 + rnd.nextInt(12)
        id -> Seq.fill(len)("abc" (rnd.nextInt(3)).toString).mkString(" ")
      }
      val allWins: Map[Seq[String], Int] = docs
        .flatMap { case (_, t) => t.split(" ").toSeq.sliding(k).filter(_.size == k) }
        .groupBy(identity).map { case (w, xs) => w -> xs.size }
      val want = docs.flatMap { case (id, t) =>
        val toks = t.split(" ").toSeq
        val covered = (1 to math.max(0, toks.size - k + 1))
          .filter(p => allWins(toks.slice(p - 1, p - 1 + k)) >= 2)
        // gaps-and-islands merge
        val spans = covered.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.reverse
        spans.map { case (s, e) => (id, s.toLong, (e + k - 1).toLong,
          (e + k - 1 - s + 1).toLong) }
      }.toSet
      val got = Dedup.maximalRepeatedSpans(
          docs.toDF("doc_id", "text"), "text", "doc_id", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === want, s"trial $trial k=$k docs=$docs")
    }
  }

  test("maximalRepeatedSpans: a 1e5-occurrence hot digest never buffers in a digest group") {
    // one viral 4-token boilerplate pasted into 100k docs (the r12
    // advisory: `count over (partition by digest)` landed all occurrences
    // of a hot digest in ONE WindowExec group — straggler + spill). The
    // two-level count collapses the hot digest map-side, and the
    // instance flags stream through a shuffled-hash semi join.
    val docs = spark.range(100000L)
      .select(col("id").as("doc_id"),
        concat(lit("lorem ipsum dolor sit unique"),
          col("id").cast("string")).as("text"))
    val out = Dedup.maximalRepeatedSpans(docs, "text", "doc_id", k = 4)
    // every doc: tokens (lorem ipsum dolor sit uniqueN) → hot window at
    // pos 1 (100k occurrences), unique window at pos 2 → one span 1..4
    assert(out.count() === 100000L)
    val sample = out.filter(col("doc_id") === 12345L).collect()
    assert(sample.length === 1)
    assert(sample.head.getLong(1) === 1L && sample.head.getLong(2) === 4L)
    val plan = out.queryExecution.executedPlan.toString
    // bounded per-task materialization, by construction: the duplicate
    // test is a map-side-partial count (each task contributes ONE partial
    // row per digest), and no window ever partitions by the digest key
    assert(plan.contains("partial_count"),
      s"expected a map-side partial count of digests:\n$plan")
    assert(plan.linesIterator.filter(_.contains("Window"))
        .forall(!_.contains("__k")),
      s"no window may partition by the digest key:\n$plan")
    assert(plan.contains("ShuffledHashJoin") && plan.contains("LeftSemi"),
      s"instance flags must stream through a shuffled-hash semi join:\n$plan")
  }
}
