package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusSpec extends SparkTestBase {

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "reach me at bob.smith+work@corp.example.org or 555-1234 today"),
      (2L, "no pii in this one at all"),
      (3L, "two mails a@b.io c@d.net and 555-0000 555-9999"),
      (4L, "not a phone 12-34 or 1234-5678 or a@b (no tld)")
    ).toDF("doc_id", "text")
  }

  test("redactPii replaces emails and phones, leaves near-misses alone") {
    val red = docs.withColumn("red", Corpus.redactPii(col("text")))
      .orderBy("doc_id").select("red").collect().map(_.getString(0))
    assert(red(0) === "reach me at <EMAIL> or <PHONE> today")
    assert(red(1) === "no pii in this one at all")
    assert(red(2) === "two mails <EMAIL> <EMAIL> and <PHONE> <PHONE>")
    assert(red(3) === "not a phone 12-34 or 1234-5678 or a@b (no tld)")
  }

  test("matchCount counts what redaction replaces") {
    val counts = docs.select(col("doc_id"),
      Corpus.matchCount(col("text"), Corpus.emailPattern).as("e"),
      Corpus.matchCount(col("text"), Corpus.phonePattern).as("p"))
      .orderBy("doc_id").collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(counts.toSeq === Seq((1, 1), (0, 0), (2, 2), (0, 0)))
  }

  test("chunkByTokens: exact multiple, remainder, and short docs") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 8).map(i => s"t$i").mkString(" ")), // 8 tokens -> 2 chunks of 4
      (2L, (1 to 5).map(i => s"t$i").mkString(" ")), // 5 tokens -> 4 + 1
      (3L, "single")                                 // 1 token  -> 1 chunk
    ).toDF("doc_id", "text")
    val chunks = Corpus.chunkByTokens(d, "text", chunkSize = 4)
      .select("doc_id", "chunk_idx", "chunk_tokens", "chunk_text")
      .orderBy("doc_id", "chunk_idx").collect()
    assert(chunks.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1L, 0, 4), (1L, 1, 4), (2L, 0, 4), (2L, 1, 1), (3L, 0, 1)))
    assert(chunks(0).getString(3) === "t1 t2 t3 t4")
    assert(chunks(3).getString(3) === "t5")
    // chunks concatenate back to the normalized document
    val rebuilt = Corpus.chunkByTokens(d, "text", 4)
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("chunk_text"))).as("all"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(rebuilt.toSeq === d.orderBy("doc_id").collect()
      .map(r => r.getString(1).toLowerCase.trim).toSeq)
  }

  test("chunkByTokens with stride: sliding windows overlap and cover the tail") {
    import spark.implicits._
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Corpus.chunkByTokens(d, "text", chunkSize = 4, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(chunks.toSeq === Seq(
      (0, "t1 t2 t3 t4"), (1, "t3 t4 t5 t6"),
      (2, "t5 t6 t7 t8"), (3, "t7 t8 t9 t10")))
    // 11 tokens: a short tail window is emitted, nothing starts past the end
    val d11 = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val tail = Corpus.chunkByTokens(d11, "text", chunkSize = 4, stride = 2)
      .orderBy("chunk_idx").select("chunk_text").collect().map(_.getString(0))
    assert(tail.last === "t9 t10 t11")
    assert(tail.length === 5)
    // stride wider than the window would silently drop tokens: refused
    assert(intercept[IllegalArgumentException] {
      Corpus.chunkByTokens(d, "text", chunkSize = 4, stride = 5)
    }.getMessage.contains("stride"))
  }

  test("packAssignments: contiguous per-shard spans, straddling documents") {
    import spark.implicits._
    // one shard, budget 10: docs of 4/8/3 tokens -> spans [0,4) [4,12) [12,15)
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b c d e f g h"),
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val r = Corpus.packAssignments(d, "text", "doc_id", budget = 10,
      nShards = 1, shard = Some(lit(0L)))
      .orderBy("doc_id")
      .select("tokens", "tok_start", "pack_first", "pack_last")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(
      (4, 0L, 0L, 0L),   // fits pack 0
      (8, 4L, 0L, 1L),   // straddles the 10-token boundary
      (3, 12L, 1L, 1L))) // fits pack 1
  }

  test("packAssignments: shards pack independently; hashed default is stable") {
    import spark.implicits._
    val d = (1L to 40L).map(i => (i, ("tok " * (i % 5 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val byMod = Corpus.packAssignments(d, "text", "doc_id", budget = 7,
      nShards = 4, shard = Some(pmod(col("doc_id"), lit(4))))
    // each shard's stream starts at 0 and spans are gap-free: within a
    // shard, every tok_start equals the previous doc's start + tokens
    val rows = byMod.select("shard", "doc_id", "tokens", "tok_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      assert(sorted.head._4 === 0L)
      sorted.sliding(2).foreach {
        case Array((_, _, tok, st), (_, _, _, st2)) => assert(st2 === st + tok)
        case _ =>
      }
    }
    // hashed default: deterministic across runs, all shards in range
    val h1 = Corpus.packAssignments(d, "text", "doc_id", budget = 7, nShards = 4)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val h2 = Corpus.packAssignments(d, "text", "doc_id", budget = 7, nShards = 4)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(h1 === h2)
    assert(h1.map(_._2).forall(s => s >= 0 && s < 4))
  }

  test("stratifiedSampleMod keeps exactly the configured buckets") {
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val kept = Corpus.stratifiedSampleMod(d, "s", "id",
      Map("a" -> 0.3, "b" -> 0.6), buckets = 10)
    val byStratum = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // stratum a: even ids with id%10 in {0,2} -> 2 of 5 even residues = 200
    // stratum b: odd ids with id%10 in {1,3,5} -> 300
    assert(byStratum === Map("a" -> 200L, "b" -> 300L))
    // unlisted strata default to dropped
    assert(Corpus.stratifiedSampleMod(d, "s", "id", Map("a" -> 0.3), buckets = 10)
      .filter(col("s") === "b").count() === 0)
  }

  test("balanceToSmallest downsamples every domain to the smallest's token mass") {
    import spark.implicits._
    // domain a: 100 docs x 2 tokens = 200; domain b: 100 docs x 8 tokens = 800
    val d = (0L until 100L).map(i => (i, "a", "t t")) ++
      (100L until 200L).map(i => (i, "b", "t t t t t t t t"))
    val out = Corpus.balanceToSmallest(d.toDF("id", "dom", "text"),
      "text", "dom", "id", buckets = 100)
    val fracs = out.select("dom", "keep_frac").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fracs("a") === 1.0)   // the smallest domain keeps everything
    assert(fracs("b") === 0.25)  // 200/800
    val counts = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") === 100L)
    // ids 100..199 -> id%100 < 25 keeps exactly 25 docs
    assert(counts("b") === 25L)
  }

  test("hashed stratifiedSample hits fractions approximately and is salt-stable") {
    import spark.implicits._
    val d = (0L until 2000L).map(i => (i, "x")).toDF("id", "s")
    val n = Corpus.stratifiedSample(d, "s", "id", Map("x" -> 0.5)).count()
    assert(n > 800 && n < 1200, s"expected ~1000 of 2000, got $n")
    val again = Corpus.stratifiedSample(d, "s", "id", Map("x" -> 0.5)).count()
    assert(again === n) // deterministic given (key, salt)
    val other = Corpus.stratifiedSample(d, "s", "id", Map("x" -> 0.5), salt = 7L).count()
    assert(other > 800 && other < 1200)
  }

  test("holdoutSplit is total, disjoint, deterministic and ~honors fractions") {
    import spark.implicits._
    val d = (0L until 3000L).map(i => (i, s"doc$i")).toDF("id", "t")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val assigned = Corpus.holdoutSplit(d, "id", splits)
    // total + disjoint: every row gets exactly one split value
    assert(assigned.count() === 3000)
    val bySplit = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit.values.sum === 3000L)
    assert(bySplit("train") > 2200 && bySplit("train") < 2600,
      s"~2400 expected, got ${bySplit("train")}")
    // identical assignment on re-run (pure function of key+salt)
    val again = Corpus.holdoutSplit(d, "id", splits)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = assigned.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first === again)
    // mod variant covers every bucket when fractions sum to 1
    val mod = Corpus.holdoutSplitMod(d, "id", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mod === Map("train" -> 2400L, "val" -> 300L, "test" -> 300L))
  }

  test("shardShuffle matches window ntile/row_number exactly, with no global window in its plan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = (0L until 997L).map(i => (i, s"doc$i")).toDF("id", "t")
    val got = Corpus.shardShuffle(d, "id", "s1", 8, parts = 5)
      .select("id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // ground truth: the single-partition window formulation (test-only)
    val h = d.withColumn("h", md5(concat(col("id").cast("string"), lit(":s1"))))
    val withShard = h.withColumn("shard", ntile(8).over(Window.orderBy("h")))
    val want = withShard.withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy("h")).cast("long"))
      .select("id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === want)
    // sizes differ by at most one, larger shards first (ntile contract)
    val sizes = got.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.keySet === (1 to 8).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes(1) >= sizes(8))
  }

  test("stratifiedTake: exact counts, small strata keep all, deterministic, WindowGroupLimit plan") {
    import spark.implicits._
    val d = ((0L until 100L).map(i => (i, "big")) ++ (100L until 103L).map(i => (i, "small")))
      .toDF("id", "g")
    def run(parts: Int, salt: String) =
      Corpus.stratifiedTake(d.repartition(parts), "g", "id", n = 10, salt)
        .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s = run(3, "a")
    assert(s.count(_._1 == "big") === 10)
    assert(s.count(_._1 == "small") === 3) // fewer than n: keep everything
    assert(s === run(8, "a"))
    assert(s !== run(3, "b"))
    // rank-filter lowers to WindowGroupLimit: per-task partial top-n
    val plan = Corpus.stratifiedTake(d, "g", "id", 10, "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("weightedSample: deterministic, weight-sensitive, TakeOrdered plan, positive-weight guard") {
    import spark.implicits._
    val d = (0L until 400L).map(i => (i, if (i == 7L) 1e6 else 0.5)).toDF("id", "w")
    def run(parts: Int, salt: String) =
      Corpus.weightedSample(d.repartition(parts), "id", "w", k = 20, salt)
        .select("id").as[Long].collect().toSet
    val s1 = run(2, "a")
    // the overwhelming-weight item is drawn (priority ~1e-6 of the rest)
    assert(s1.contains(7L))
    // deterministic across partitionings; salt redraws
    assert(s1 === run(9, "a"))
    assert(s1 !== run(2, "b"))
    // top-k lowers to TakeOrderedAndProject (per-partition partial top-k)
    val plan = Corpus.weightedSample(d, "id", "w", 20, "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
    // zero/negative/null weights are loud, not silently prioritized
    val bad = Seq((1L, 0.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Corpus.weightedSample(bad, "id", "w", 5, "a").collect()
    }
    assert(e.getMessage.contains("non-positive weight")
      || Option(e.getCause).exists(_.getMessage.contains("non-positive weight")))
  }

  test("runningTotal matches the global-window cumulative sum across partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = (0L until 500L).map(i => (i, (i * 37) % 101, (i * 13) % 50))
      .toDF("id", "prio", "v")
    // ground truth: single-partition window formulation (test-only)
    val want = d.withColumn("rt",
        sum(col("v")).over(Window.orderBy(col("prio").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = Corpus.runningTotal(d.repartition(parts),
          Seq(col("prio").desc, col("id").asc), col("v"), "rt", parts = 4)
        .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"mismatch at input parts=$parts")
    }
  }

  test("runningTotal on an empty frame returns an empty frame with the added column") {
    import spark.implicits._
    val d = Seq.empty[(Long, Long)].toDF("id", "v")
    val out = Corpus.runningTotal(d, Seq(col("id")), col("v"), "rt", parts = 4)
    assert(out.columns.toSeq === Seq("id", "v", "rt"))
    assert(out.count() === 0L)
  }

  test("runningTotal counts null values as 0 and keeps every row") {
    import spark.implicits._
    val d = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "v")
    val got = Corpus.runningTotal(d, Seq(col("id")), col("v"), "rt", parts = 2)
      .select("id", "rt").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 5L), (2L, 5L), (3L, 12L)))
  }

  test("selectToBudget keeps the strict prefix: boundary row in, overflow row out") {
    import spark.implicits._
    val d = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 1L)).toDF("id", "v")
    def ids(budget: Long) =
      Corpus.selectToBudget(d, Seq(col("id")), col("v"), budget, parts = 2)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(20L) === Set(1L, 2L)) // exact boundary row kept
    assert(ids(29L) === Set(1L, 2L)) // id=3 overflows; id=4 (small) NOT pulled forward
    assert(ids(31L) === Set(1L, 2L, 3L, 4L))
    assert(ids(0L) === Set.empty[Long])
  }

  test("shardShuffle is deterministic across partitionings; seed redraws the permutation") {
    import spark.implicits._
    val d = (0L until 400L).map(i => (i, i % 7)).toDF("id", "grp")
    def run(parts: Int, seed: String) =
      Corpus.shardShuffle(d.repartition(parts), "id", seed, 4)
        .select("id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(2, "a") === run(9, "a"))
    assert(run(3, "a") !== run(3, "b"))
    // q == 0 edge: more shards than rows → one row per leading shard
    val tiny = (0L until 3L).map(i => Tuple1(i)).toDF("id")
    val t = Corpus.shardShuffle(tiny, "id", "x", 8)
      .select("shard", "pos").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(t.map(_._1).sorted.toSeq === Seq(1, 2, 3) && t.forall(_._2 == 1L))
  }

  test("temperatureMix: alpha interpolates natural -> flat; fractions match closed form") {
    import spark.implicits._
    // big domain 10x the tokens of the small one
    val docs = ((0L until 100L).map(i => (i, "a b c d e", "big")) ++
      (100L until 110L).map(i => (i, "a b c d e", "small"))).toDF("doc_id", "text", "src")
    def fracs(alpha: Double, budget: Long): Map[String, Double] =
      Corpus.temperatureMix(docs, "text", "src", "doc_id", alpha, budget)
        .select("src", "keep_frac").distinct().collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // closed form at alpha=0.5: weights sqrt(500), sqrt(50);
    // target_d = budget * w_d / (w_big + w_small); frac = min(1, target/tokens)
    val (wb, ws) = (math.sqrt(500.0), math.sqrt(50.0))
    // budget small enough that neither domain clamps at 1
    val f = fracs(0.5, 180L)
    assert(math.abs(f("big") - 180.0 * wb / (wb + ws) / 500.0) < 1e-12)
    assert(math.abs(f("small") - 180.0 * ws / (wb + ws) / 50.0) < 1e-12)
    // alpha=0.5 up-weights the small domain vs its natural (alpha=1) share
    val natural = fracs(1.0, 180L)
    assert(f("small") > natural("small"))
    assert(f("big") < natural("big"))
    // a budget beyond the corpus clamps at 1 (no upsampling) and keeps all
    val all = Corpus.temperatureMix(docs, "text", "src", "doc_id", 0.5, 1000000L)
    assert(all.count() === 110)
    assert(all.select(min(col("keep_frac"))).collect().head.getDouble(0) === 1.0)
  }

  test("dsirScores: target-like documents carry higher importance weights") {
    import spark.implicits._
    // target speaks {alpha beta}, the rest of the pool speaks {gamma delta};
    // a raw doc written in target vocabulary must out-score a raw doc
    // written in pool vocabulary, and every empty doc drops out
    val docs = (
      (0L until 20L).map(i => (i, "alpha beta alpha beta", true)) ++
      (20L until 60L).map(i => (i, "gamma delta gamma delta", false)) ++
      Seq((100L, "alpha beta", false), (101L, "gamma delta", false),
        (102L, "   ", false), (103L, "alpha beta alpha beta", false))
    ).toDF("doc_id", "text", "is_t")
    val scored = Corpus.dsirScores(docs, "text", "doc_id", col("is_t"),
        buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!scored.contains(102L), "whitespace-only doc has no tokens")
    val (nT, wTargetLike) = scored(100L)
    val (nP, wPoolLike) = scored(101L)
    assert(nT === 2 && nP === 2)
    assert(wTargetLike > wPoolLike,
      s"target-vocabulary doc must out-score pool-vocabulary doc: $wTargetLike vs $wPoolLike")
    assert(wTargetLike > 0.0 && wPoolLike < 0.0,
      "log-ratio sign tracks which distribution the doc resembles")
    // weights are per-token sums UNDER ONE FIT: doc 103 repeats doc 100's
    // text twice, so its log weight is exactly double within the same run
    val (n2, w2) = scored(103L)
    assert(n2 === 4)
    assert(math.abs(w2 - 2.0 * wTargetLike) < 1e-9)
  }

  test("stripBoilerplate drops cross-doc repeated segments, keeps order, keeps all docs") {
    import spark.implicits._
    // seg=2 tokens; "cookie banner" tiles appear verbatim in docs 1-3
    // (df=3 >= 3) at different positions; unique content stays
    val d = Seq(
      (1L, "cookie banner alpha beta gamma delta"),
      (2L, "epsilon zeta cookie banner eta theta"),
      (3L, "iota kappa lam mu cookie banner"),
      (4L, "nu xi omicron pi")
    ).toDF("doc_id", "text")
    val out = Corpus.stripBoilerplate(d, "text", "doc_id",
        segTokens = 2, maxDocFreq = 3L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) === ((1L, "alpha beta gamma delta", 2L, 1L, 2L)))
    // doc 2's banner sits MID-document: surviving segments rejoin in order
    assert(out(1) === ((2L, "epsilon zeta eta theta", 2L, 1L, 2L)))
    assert(out(2) === ((3L, "iota kappa lam mu", 2L, 1L, 2L)))
    // untouched doc passes through whole
    assert(out(3) === ((4L, "nu xi omicron pi", 2L, 0L, 0L)))
  }

  test("stripBoilerplate: fully-boilerplate doc yields empty text; sub-threshold repeats survive") {
    import spark.implicits._
    val d = Seq(
      (1L, "legal footer"), (2L, "legal footer"), (3L, "legal footer"),
      (4L, "twice only"), (5L, "twice only")
    ).toDF("doc_id", "text")
    val out = Corpus.stripBoilerplate(d, "text", "doc_id",
        segTokens = 2, maxDocFreq = 3L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out(0) === ((1L, "", 1L)))
    assert(out(1) === ((2L, "", 1L)))
    assert(out(2) === ((3L, "", 1L)))
    // df=2 < maxDocFreq: kept verbatim
    assert(out(3) === ((4L, "twice only", 0L)))
    assert(out(4) === ((5L, "twice only", 0L)))
  }

  test("stripBoilerplate counts within-doc repeats once for df but drops every occurrence") {
    import spark.implicits._
    // "spam spam" occurs twice inside docs 1 and 2 — distinct-doc df is 2,
    // so with maxDocFreq=2 it IS boilerplate and BOTH occurrences drop
    val d = Seq(
      (1L, "spam spam aaaa bbbb spam spam"),
      (2L, "cccc dddd spam spam spam spam"),
      (3L, "eeee ffff")
    ).toDF("doc_id", "text")
    val out = Corpus.stripBoilerplate(d, "text", "doc_id",
        segTokens = 2, maxDocFreq = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((1L, "aaaa bbbb", 1L, 2L)))
    assert(out(1) === ((2L, "cccc dddd", 1L, 2L)))
    assert(out(2) === ((3L, "eeee ffff", 1L, 0L)))
  }
}
