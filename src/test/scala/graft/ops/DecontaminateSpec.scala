package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {

  // probe doc shares the window "quick brown fox" with corpus docs 1 and 2
  // (2 normalizes to it case/whitespace-wise); 3 shares only shorter runs;
  // 4 is clean; 5 is too short to form a trigram
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "A Quick  Brown Fox appears"),
      (3L, "en", "quick brown dogs and brown fox cubs"),
      (4L, "de", "völlig anderer inhalt ohne überschneidung"),
      (5L, "en", "quick brown")
    ).toDF("doc_id", "lang", "text")
  }

  private lazy val probes: DataFrame = {
    import spark.implicits._
    Seq((100L, "en", "my quick brown fox story")).toDF("doc_id", "lang", "text")
  }

  test("ngramOverlap reports contaminated docs with gram and hit counts") {
    val r = Decontaminate.ngramOverlap(corpus, probes, "text", "doc_id",
      n = 3, keepCols = Seq("lang")).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("lang"),
        x.getAs[Int]("n_grams"), x.getAs[Long]("n_hits"))).sortBy(_._1)
    // probe trigrams: {my quick brown, quick brown fox, brown fox story}
    // doc 1: 7 trigrams, hits only "quick brown fox"
    // doc 2: normalized "a quick brown fox appears" -> hits the same one
    // docs 3/4 share no trigram; doc 5 has none at all
    assert(r.toSeq === Seq((1L, "en", 7, 1L), (2L, "en", 3, 1L)))
  }

  test("removeContaminated keeps exactly the clean documents") {
    val kept = Decontaminate.removeContaminated(corpus, probes,
      "text", "doc_id", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(3L, 4L, 5L))
    // and with a window no probe can form, nothing is removed
    val all = Decontaminate.removeContaminated(corpus, probes,
      "text", "doc_id", n = 6)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(all.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("the probe-gram side broadcasts: the corpus never shuffles pre-join") {
    val df = Decontaminate.ngramOverlap(corpus, probes, "text", "doc_id", n = 3)
    df.collect() // finalize AQE
    // AQE's toString appends the pre-adaptive plan; assert on the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"probe grams should broadcast:\n$plan")
    // exactly two exchanges: the probe-side distinct (small, pre-broadcast)
    // and the final per-doc aggregation of the hits — a CORPUS-side shuffle
    // before the join would be a 100 TB scale bug
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"expected probe-distinct + agg exchanges only:\n$plan")
    // and the corpus branch (the join's streamed side) is exchange-free:
    // everything above the corpus explode is in the same codegen stage
    val streamed = plan.split("BroadcastHashJoin").last
      .split("BroadcastQueryStage|BroadcastExchange").head
    assert(!streamed.contains("Exchange"),
      s"corpus side must not shuffle before the join:\n$plan")
  }
}
