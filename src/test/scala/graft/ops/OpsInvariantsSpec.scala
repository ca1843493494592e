package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Randomized (seeded, reproducible) invariants for the corpus operators:
 * properties computed independently in plain Scala over the same generated
 * documents must hold for the distributed implementation on every draw.
 */
class OpsInvariantsSpec extends SparkTestBase {

  private val rnd = new Random(20240812L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "the", "of", "and", "data")

  private def randomDocs(n: Int, maxTokens: Int): Seq[(Long, String)] =
    (1L to n.toLong).map { id =>
      val len = 1 + rnd.nextInt(maxTokens)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }

  test("packAssignments invariants on random corpora") {
    import spark.implicits._
    val docs = randomDocs(120, 30)
    val budget = 17
    val df = docs.toDF("doc_id", "text")
    val out = Corpus.packAssignments(df, "text", "doc_id",
      budget = budget, nShards = 4)
      .select("doc_id", "shard", "tokens", "tok_start", "pack_first", "pack_last")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length === docs.length)
    val tokenCountOf = docs.map { case (id, t) => id -> t.split("\\s+").length }.toMap
    out.foreach { case (id, _, tokens, start, pf, pl) =>
      assert(tokens === tokenCountOf(id))
      assert(pf === start / budget)
      assert(pl === (start + tokens - 1) / budget)
      assert(pf <= pl && pl - pf <= tokens / budget + 1)
    }
    // per shard: doc spans tile [0, shard total) with no gaps or overlaps
    out.groupBy(_._2).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_._1)
      sorted.foldLeft(0L) { case (expectedStart, (_, _, tokens, start, _, _)) =>
        assert(start === expectedStart)
        start + tokens
      }
    }
  }

  test("unigramLmScore invariants on random corpora") {
    import spark.implicits._
    val docs = randomDocs(100, 25)
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.unigramLmScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent Scala recompute of the unigram distribution
    val allToks = docs.flatMap(_._2.split("\\s+"))
    val freq = allToks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val total = allToks.size.toDouble
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+")
      val (n, score) = got(id)
      assert(n === toks.length)
      val expected = toks.map(t => math.log(freq(t) / total)).sum / toks.length
      assert(math.abs(score - expected) < 5e-4, s"doc $id: $score vs $expected")
      // log-probabilities are never positive
      assert(score <= 0.0)
    }
  }

  test("quantizeInt8 invariants on random vectors") {
    import spark.implicits._
    val vecs = (1L to 60L).map(id =>
      id -> Seq.fill(16)((rnd.nextFloat() - 0.5f) * 4.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getSeq[Int](3))).toMap
    vecs.foreach { case (id, v) =>
      val (scale, q) = got(id)
      val maxabs = v.map(x => math.abs(x.toDouble)).max
      assert(math.abs(scale - maxabs / 127.0) < 1e-12)
      assert(q.length === v.length)
      q.foreach(c => assert(c >= -127 && c <= 127))
      // dequantization error is bounded by half a quantization step
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(c * scale - x.toDouble) <= scale / 2 + 1e-9)
      }
    }
  }

  test("repetitionSignals invariants on random corpora") {
    import spark.implicits._
    val docs = randomDocs(80, 25)
    val out = TextAnalysis.repetitionSignals(
      docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length === docs.length)
    val byId = docs.toMap
    out.foreach { case (id, nTokens, dupFrac, topTok, topBg) =>
      val toks = byId(id).split("\\s+").toSeq
      assert(nTokens === toks.length)
      val expectDup = math.rint((1.0 - toks.distinct.length.toDouble / toks.length) * 1e4) / 1e4
      assert(dupFrac === expectDup)
      val expectTop = math.rint(
        toks.groupBy(identity).values.map(_.size).max.toDouble / toks.length * 1e4) / 1e4
      assert(topTok === expectTop)
      assert(topBg >= 0.0 && topBg <= 1.0)
      if (toks.length < 2) assert(topBg === 0.0)
    }
  }

  test("chunkByTokens invariants: tiling reconstructs, windows cover") {
    import spark.implicits._
    val docs = randomDocs(60, 40)
    val df = docs.toDF("doc_id", "text")
    // no-overlap tiling: concatenating a doc's chunks gives back its tokens
    val tiled = Corpus.chunkByTokens(df, "text", chunkSize = 7)
      .select("doc_id", "chunk_idx", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val rebuilt = tiled(id).sortBy(_._2).map(_._3).mkString(" ")
      assert(rebuilt === text.split("\\s+").mkString(" "))
    }
    // sliding windows: every token position is inside >= 1 window
    val slid = Corpus.chunkByTokens(df, "text", chunkSize = 7, stride = 3)
      .select("doc_id", "chunk_idx", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val n = text.split("\\s+").length
      val covered = slid(id).flatMap { case (_, idx, ct) =>
        (idx * 3) until (idx * 3 + ct) }.toSet
      assert(covered === (0 until n).toSet)
    }
  }

  test("decontamination partition: flagged + kept = corpus, flags are true") {
    import spark.implicits._
    val corpus = randomDocs(60, 12).toDF("doc_id", "text")
    val probes = randomDocs(100, 12).filter(_._1 % 7 == 0).toDF("doc_id", "text")
    val n = 2
    def grams(t: String) = t.split("\\s+").sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSet
    val probeGrams = probes.collect().flatMap(r => grams(r.getString(1))).toSet
    val flagged = Decontaminate.ngramOverlap(corpus, probes, "text", "doc_id", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Decontaminate.removeContaminated(corpus, probes, "text", "doc_id", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((flagged intersect kept).isEmpty)
    assert((flagged union kept) === all)
    // independently recomputed truth
    corpus.collect().foreach { r =>
      val hit = grams(r.getString(1)).exists(probeGrams.contains)
      assert(flagged.contains(r.getLong(0)) === hit,
        s"doc ${r.getLong(0)} flag mismatch")
    }
  }

  test("incrementalDedup invariants on random corpora") {
    import spark.implicits._
    // short docs from a tiny vocab -> plenty of cross- and self-duplicates
    val existing = randomDocs(40, 3)
    val incoming = randomDocs(80, 3).map { case (id, t) => (id + 1000L, t) }
    def norm(t: String) = t.trim.toLowerCase.split("\\s+").mkString(" ")
    val existingKeys = existing.map(d => norm(d._2)).toSet
    val kept = Dedup.incrementalDedup(
        incoming.toDF("doc_id", "text"), existing.toDF("doc_id", "text"),
        "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // truth: drop known content, keep the lowest id per surviving key
    val truth = incoming.filterNot(d => existingKeys.contains(norm(d._2)))
      .groupBy(d => norm(d._2)).values.map(_.map(_._1).min).toSet
    assert(kept === truth)
    // idempotence: re-ingesting the kept batch against existing+kept is empty
    val keptDocs = incoming.filter(d => kept.contains(d._1))
    val union = (existing ++ keptDocs).toDF("doc_id", "text")
    assert(Dedup.incrementalDedup(keptDocs.toDF("doc_id", "text"), union,
      "text", "doc_id").count() === 0L)
  }

  test("retentionCohorts invariants on random event streams") {
    import spark.implicits._
    val days = (1 to 9).map(d => f"2024-02-0$d%d")
    val events = (1L to 300L).map { i =>
      val user = 1L + rnd.nextInt(25)
      val day = days(rnd.nextInt(days.size))
      (user, java.sql.Timestamp.valueOf(s"$day ${10 + rnd.nextInt(10)}:00:00"))
    }
    val out = Sessionize.retentionCohorts(events.toDF("user_id", "ts"))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val firstDay = events.groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2.toString.take(10)).min }
    val userDays = events.map(e => (e._1, e._2.toString.take(10))).distinct
    // every (cohort, offset) count equals the independent recount
    val truth = userDays.groupBy { case (u, d) =>
      val c = firstDay(u)
      (c, java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(c), java.time.LocalDate.parse(d)).toInt)
    }.map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    assert(out.toSet === truth)
    // offset 0 exists for every cohort and counts its newcomers
    val newcomers = firstDay.groupBy(_._2).map { case (d, us) => d -> us.size.toLong }
    newcomers.foreach { case (d, n) =>
      assert(out.contains((d, 0, n)), s"cohort $d day-0 row")
    }
  }
}
