package graft

import org.apache.spark.sql.functions._

import graft.apps.ActivityData
import graft.table.GraftTable

/**
 * Guards the physical-plan properties that matter at 100 TB (SURVEY.md §4):
 * partition pruning, filter pushdown, column pruning, broadcast choice and
 * whole-stage codegen on the flagship paths. A plan regression here is a
 * scale bug even when results stay correct.
 */
class PlanQualitySpec extends SparkTestBase {

  private lazy val table: GraftTable = {
    val loc = tmpDir("planq")
    val t = GraftTable.create(spark, loc, "planq", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    t.append(ActivityData.day2(spark))
    t.append(ActivityData.day3(spark))
    t
  }

  test("partition-column filter prunes partitions at the scan") {
    val plan = table.toDF
      .filter(col("txn_date") === to_date(lit("2024-03-02")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(txn_date"), plan)
    assert(plan.contains("(txn_date") && plan.contains("= 2024-03-02)"), plan)
  }

  test("non-partition filter is pushed down to the parquet reader") {
    val plan = table.toDF
      .filter(col("txn_id") === "txn10")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(txn_id), EqualTo(txn_id,txn10)]"), plan)
  }

  test("projection prunes columns at the scan (ReadSchema)") {
    val plan = table.toDF
      .select("account", "amount")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.mkString("\n")
    assert(readSchema.contains("ReadSchema: struct<account:string,amount:double>"), plan)
  }

  test("flagship group-by lowers to two-phase HashAggregate in WSCG, no typed ops") {
    val df = table.toDF.groupBy("account").agg(count(lit(1)).as("n"))
    df.collect() // finalize the AQE plan so codegen stages are visible
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapElements"), plan)
    assert(plan.contains("*("), s"expected whole-stage codegen:\n$plan")
  }

  test("small dimension join broadcasts (q4 shape)") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val plan = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name").count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("merge's affected-partition probe is column-pruned") {
    // the semi-join that finds affected partitions must not read all 7 cols
    val srcKeys = ActivityData.day4(spark).select("txn_id").distinct()
    val probe = table.toDF.join(srcKeys, Seq("txn_id"), "left_semi")
      .select("txn_date").distinct()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<txn_id:string>"), plan)
  }

  test("lshTopK candidate distinct exchanges id pairs only, never vectors") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.ops.Similarity.lshTopK(e.filter(col("vec_id") < 10), e, k = 5, dim = 64)
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    val dedupAggs = plan.linesIterator.filter(_.contains("HashAggregate(keys=[query_id")).toList
    assert(dedupAggs.nonEmpty, plan)
    assert(dedupAggs.forall(l => !l.contains("__qv") && !l.contains("__cv")),
      s"candidate dedup still carries embedding vectors:\n$plan")
  }

  test("corpus ops stay narrow: no shuffle in redact/chunk/sample transforms") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pipeline = graft.ops.Corpus.chunkByTokens(
      graft.ops.Corpus.stratifiedSample(
        docs.withColumn("red", graft.ops.Corpus.redactPii(col("text"))),
        "lang", "doc_id", Map("en" -> 0.5), defaultFraction = 1.0),
      "red", chunkSize = 40)
    val plan = pipeline.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"redact+sample+chunk must be one narrow stage, found a shuffle:\n$plan")
    assert(plan.contains("*("), s"expected whole-stage codegen:\n$plan")
  }

  test("stripBoilerplate: no cross join, no global window; boilerplate side broadcasts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.ops.Corpus.stripBoilerplate(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"boilerplate strip must never plan doc x doc:\n$plan")
    assert(!plan.contains("Window"),
      s"rebuild must be an aggregate, not a global window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the >=threshold boilerplate set is dictionary-sized and must broadcast:\n$plan")
  }

  test("prepareCorpus plans exactly one exchange: the dedup digest shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pipeline = graft.ops.Corpus.prepareCorpus(docs, "text", "doc_id",
      "lang", minQuality = 0.5, fractions = Map("en" -> 0.5),
      chunkSize = 40)
    val plan = pipeline.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1,
      s"five composed stages should cost ONE shuffle, found $exchanges:\n$plan")
  }

  test("dsirScores: slot ratios broadcast; no vocabulary-keyed exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = graft.ops.Corpus.dsirScores(docs, "text", "doc_id",
      isTarget = col("lang") === "en", buckets = 256)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the 256-slot log-ratio table must broadcast back:\n$plan")
    // exchanges: the slot-count aggregate (bounded at `buckets` rows after
    // map-side combine), its broadcast, the totals fold and the final
    // doc-keyed aggregate — nothing keyed by raw token strings
    assert(!plan.contains("SortMergeJoin"),
      s"dsir must never sort-merge on token-derived keys:\n$plan")
  }

  test("packAssignments plans one shard-partitioned window, no global sort") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = graft.ops.Corpus.packAssignments(docs, "text", "doc_id",
      budget = 256, nShards = 8)
    val plan = packed.queryExecution.executedPlan.toString
    // the one exchange hash-partitions by shard; a range/single partition
    // exchange would mean a global ordering crept in — the 100 TB killer
    assert(plan.contains("Exchange hashpartitioning(shard"),
      s"expected a shard-hash exchange:\n$plan")
    assert(!plan.contains("rangepartitioning") && !plan.contains("SinglePartition"),
      s"pack windows must never globally order:\n$plan")
  }

  test("unigramLmScore carries no broadcast hint on the vocab join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = graft.ops.TextAnalysis.unigramLmScore(docs, "text", "doc_id")
    // the vocab of a 100 TB corpus exceeds driver memory, so the token join
    // must leave strategy to AQE's measured sizes (broadcasting a tiny test
    // vocab is fine — FORCING broadcast via a hint is the scale bug). The
    // only hint allowed is the single-row grand total.
    val analyzed = org.apache.spark.sql.graft.bridge.analyzedPlan(df).toString
    val hints = analyzed.linesIterator.count(_.contains("ResolvedHint"))
    assert(hints === 1,
      s"expected exactly the 1-row-total broadcast hint, got $hints:\n$analyzed")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("HashAggregate"))
  }

  test("quantizeInt8 is a narrow map: no exchange before the write") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = graft.ops.Similarity.quantizeInt8(e)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quantization must not shuffle:\n$plan")
  }

  test("kmeansStep: assignment is narrow, ONE aggregation exchange total") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.ops.Similarity.kmeansStep(e, e.filter(col("vec_id") < 8))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the nearest-centroid assignment is unrolled per-row cosine work —
    // no join, no window: the ONLY exchange in the whole step is the
    // (cluster_id, dim) mean aggregation, and never a range/global sort
    assert(!plan.contains("Window"), s"assignment must not window:\n$plan")
    // AQE prints Final + Initial sections; count exchanges in the FINAL one
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"expected exactly one exchange (the mean agg), got $exchanges:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"mean update must not globally sort:\n$plan")
  }

  test("assignToCentroids plans zero exchanges: pure map over the scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.ops.Similarity.assignToCentroids(e, e.filter(col("vec_id") < 8))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"nearest-centroid assignment must be shuffle-free:\n$plan")
  }

  test("semDedup's component tail is one pipeline: grouped union-find, no checkpoint scans") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.ops.Similarity.semDedup(e, e.filter(col("vec_id") < 8), 0.35)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the iterative CC materialized localCheckpoints (ExistingRDD scans)
    // and ran convergence-count jobs per round — at bench scale that loop
    // was ~3.5 s of semDedup's 3.7 s. Cell-local pairs make components
    // cell-local, so the tail must be the single-exchange grouped
    // union-find (FlatMapGroups), with the whole query ONE lazy pipeline.
    assert(!plan.contains("ExistingRDD"),
      s"no checkpoint materializations in the semDedup plan:\n$plan")
    assert(plan.contains("MapGroups"),
      s"expected the grouped union-find tail:\n$plan")
  }

  test("balanceToSmallest joins the per-domain fractions by broadcast") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = graft.ops.Corpus.balanceToSmallest(docs, "text", "source", "doc_id")
    val plan = df.queryExecution.executedPlan.toString
    // the fraction table is n_domains rows — the corpus-side join must be a
    // broadcast probe, never a sort-merge shuffle of the full corpus
    assert(plan.contains("BroadcastHashJoin"), s"fractions must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the full corpus must never shuffle for the mix join:\n$plan")
  }

  test("chunk-dedup window shuffles the md5 content key, not the chunk text") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = graft.ops.Corpus.chunkByTokens(
        docs.select("doc_id", "source", "text"), "text", chunkSize = 20)
      .select(col("source"), md5(col("chunk_text")).as("chunk_key"))
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("chunk_key"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(when(col("occ") > 1, 1L).otherwise(0L)).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(chunk_key"),
      s"expected the window exchange on the content key:\n$plan")
    // column pruning must drop text/chunk_text before the exchange: the
    // shuffled row is (source, chunk_key) only
    val exchangeLine = plan.linesIterator
      .find(_.contains("Exchange hashpartitioning(chunk_key")).get
    assert(!exchangeLine.contains("text"),
      s"chunk text must not ride the dedup shuffle:\n$exchangeLine")
  }

  test("unigram encode evaluates the Viterbi lattice per dictionary word, not per occurrence") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = graft.ops.UnigramLm.train(docs, "text", vocabSize = 30,
        rounds = 1, seedMultis = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val df = graft.ops.UnigramLm.encodeTokenCounts(docs, "doc_id", "text", vocab)
    val plan = df.queryExecution.executedPlan.toString
    // the distinct word set is checkpointed before the lattice projection:
    // without the lineage break, PushDownPredicates moves the __pr filter
    // (and the whole DP with it) below the distinct, evaluating the
    // lattice once per corpus occurrence instead of once per word
    // (measured ~25x on sf0.1 — round-13 regression)
    assert(plan.contains("Scan ExistingRDD"),
      s"the lattice must sit on the checkpointed dictionary, not the corpus lineage:\n$plan")
    val latticeLines = plan.linesIterator.filter(_.contains("lambdafunction")).toSeq
    assert(latticeLines.nonEmpty, s"expected the HOF lattice in the plan:\n$plan")
    assert(!plan.contains("Generate explode") ||
      latticeLines.forall(!_.contains("explode")),
      s"the lattice must never ride an exploded-occurrence subtree:\n$plan")
  }

  test("ivfDriftStats: narrow assignment + batch-keyed partial agg + 1-row baseline broadcast") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centers = graft.ops.Similarity.buildIvfIndex(e, nCells = 4).centers
    val df = graft.ops.Similarity.ivfDriftStats(
      e.withColumn("batch", (col("vec_id") % 3).cast("int")),
      centers, "batch", baselineBatch = lit(0))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the |batches|-row stats are checkpointed (the assignment + batch
    // aggregate ran ONCE, eagerly), so the returned plan reads the pinned
    // frame twice and attaches the 1-row baseline by broadcast — a
    // SortMergeJoin or a re-derivation of the corpus subtree would mean
    // the pin regressed
    assert(plan.contains("Scan ExistingRDD"),
      s"stats must be pinned — both consumers read the checkpoint:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row baseline must attach by broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join in the drift plan:\n$plan")
    assert(!plan.contains("parquet"),
      s"the corpus subtree must not be re-derived after the checkpoint:\n$plan")
    // corpus-side shape (the eager checkpoint runs it before the returned
    // plan exists): the same public assignment + batch aggregate must stay
    // a narrow map with a map-side partial combine, no shuffle join
    val corpusSide = graft.ops.Similarity.assignIvfCells(e, centers)
      .groupBy((col("neighbor_id") % 3).as("batch"))
      .agg(avg(col("neighbor_id")).as("m"))
    corpusSide.collect()
    val cPlan = corpusSide.queryExecution.executedPlan.toString
    assert(cPlan.contains("partial_avg"),
      s"batch aggregate must partial-combine map-side:\n$cPlan")
    assert(!cPlan.contains("SortMergeJoin") && !cPlan.contains("Window"),
      s"the assignment must stay a narrow map below the unroll limit:\n$cPlan")
  }

  test("duplicatedSpanStats shuffles window digests + ids, never window text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = graft.ops.Dedup.duplicatedSpanStats(docs, "text", "doc_id", 8)
    val plan = df.queryExecution.executedPlan.toString
    // every exchange row is (digest, id)-shaped: the projected md5 must be
    // computed BEFORE the shuffle, so no exchange carries text or the raw
    // window string
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    exchanges.foreach { l =>
      assert(!l.contains("text") && !l.contains("__w"),
        s"window/document text must not ride a dup-span shuffle:\n$l")
    }
    // the hot-digest-safe shape (round 13): a two-level per-digest
    // aggregate whose MAP-SIDE partial min/max collapses every digest to
    // one row per input partition before the exchange (no WindowExec
    // group ever buffers a digest's full occurrence list), then a
    // streaming shuffled-hash join of the instances against the stats
    assert(!plan.contains("Window"),
      s"no window over the digest key — a hot digest would buffer its full occurrence list in one group:\n$plan")
    assert(plan.contains("partial_min") && plan.contains("partial_max"),
      s"expected map-side partial min/max collapsing digests before the exchange:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a streaming shuffled-hash join of instances vs digest stats (sort-merge would re-buffer the hot partition in its sort):\n$plan")
    assert(!plan.contains("Expand"),
      s"no countDistinct expand should appear:\n$plan")
  }

  test("heavyHitters: MG summary aggregates map-side; exact pass semi-joins candidates") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val items = docs.select(
      explode(graft.ops.TextAnalysis.tokens(col("text"))).as("item"))
    val df = graft.ops.HeavyHitters.heavyHitters(items, "item", 100)
    val plan = df.queryExecution.executedPlan.toString
    // the candidate pass must partial-aggregate per task: only k-entry
    // summaries ride the shuffle, never per-item counts of the vocabulary
    assert(plan.contains("partial_misra_gries"),
      s"expected a map-side partial MG summary:\n$plan")
    // the exact pass touches candidate rows only, via a broadcast-able
    // k-row semi-join
    assert(plan.contains("LeftSemi"),
      s"expected the candidate semi-join before the exact count:\n$plan")
  }

  test("editDistanceJoin candidate shuffle carries segments, not full strings") {
    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .select(col("s_suppkey").as("id"), col("s_name").as("s"))
    val df = graft.ops.FuzzyJoin.editDistanceJoin(sup, "s", "id", 2)
    val plan = df.queryExecution.executedPlan.toString
    // the (content, index, length) candidate exchanges must not carry the
    // full string column — only the verify step re-fetches strings by id
    plan.linesIterator.filter(l =>
        l.contains("Exchange hashpartitioning(__c")).foreach { l =>
      assert(!l.contains("__s#"),
        s"full strings must not ride the candidate shuffle:\n$l")
    }
    assert(plan.contains("Exchange hashpartitioning(__c")
      || plan.contains("BroadcastHashJoin"),
      s"expected an equi-join on segment buckets:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"fuzzy join must never fall back to all-pairs:\n$plan")
  }

  test("incrementalDedup leaves anti-join strategy to AQE (no broadcast hint)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = graft.ops.Dedup.incrementalDedup(
      docs, docs.filter(col("doc_id") % 10 === 0), "text", "doc_id")
    // the accumulated corpus is unbounded at 100 TB — forcing a broadcast
    // of its key set is the scale bug the advisory flagged on the other
    // kill-list joins; AQE may still broadcast a measured-small side
    val analyzed = org.apache.spark.sql.graft.bridge.analyzedPlan(df).toString
    assert(!analyzed.contains("ResolvedHint"),
      s"no forced strategy on the corpus anti-join:\n$analyzed")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti-join:\n$plan")
  }

  test("retentionCohorts shuffles the events once, keyed on the user") {
    val ev = graft.queries.EventsReader.read(spark, "/root/testdata/sf0.001")
    val plan = graft.ops.Sessionize.retentionCohorts(ev)
      .queryExecution.executedPlan.toString
    // cohort min and activity-day set come from ONE user-keyed aggregation;
    // a second scan-side exchange would mean the self-join shape crept in
    val userExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges === 1,
      s"expected exactly one user-keyed exchange, got $userExchanges:\n$plan")
  }

  test("per-group top-k lowers to WindowGroupLimit: map-side partial top-k") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    val plan = df.queryExecution.executedPlan.toString
    // Spark 4 rewrites rank-filter windows into WindowGroupLimit with a
    // Partial mode BEFORE the exchange — each map task ships only its
    // local top-k, so the shuffle carries O(groups*k) rows, not the table
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank-limit pushdown in the plan:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a map-side partial group limit before the exchange:\n$plan")
  }

  test("ts range filter pushes through the events loader's normalization cast") {
    // the adaptive loader casts TIMESTAMP_NTZ -> session-zoned timestamp;
    // a time-range scan is THE canonical events access pattern at scale,
    // so the cast must not strand range predicates above the parquet scan
    val ev = graft.queries.EventsReader.read(spark, "/root/testdata/sf0.001")
    val plan = ev
      .filter(col("ts") >= lit("2024-03-01 00:00:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"ts range predicate must reach the scan:\n$plan")
  }

  test("range join lowers to an equi-join on the bin, never a cross join") {
    import spark.implicits._
    val pts = (1L to 100L).map(i => (i, i * 3 % 97)).toDF("p_id", "p")
    val ivals = (1L to 30L).map(i => (i, i * 2, i * 2 + 10)).toDF("i_id", "lo", "hi")
    val plan = graft.ops.RangeJoin
      .pointInInterval(pts, ivals, "p", "lo", "hi", binWidth = 8L)
      .queryExecution.executedPlan.toString
    // the binning rewrite's whole point: the quadratic theta-join shapes
    // must be gone, replaced by a keyed join on __bin
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan a cross join:\n$plan")
    assert(plan.contains("__bin"), s"expected the bin equi-join key:\n$plan")
  }

  test("bloom anti-join: the definitely-absent branch joins nothing") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
    import spark.implicits._
    val left = (1L to 500L).map(i => (i, i % 97)).toDF("id", "k")
    val right = (1L to 50L).map(Tuple1(_)).toDF("rk")
    val df = graft.ops.Bloom.antiJoinKeys(left, right, "k", "rk", expectedItems = 50)
    val plan = org.apache.spark.sql.graft.bridge.analyzedPlan(df)
    val union = plan.collectFirst { case u: Union => u }.get
    val bypass = union.children.head
    // rows the filter rejects outright must reach the output WITHOUT any
    // join (and hence without the anti-join shuffle) — that is the entire
    // point of the prefilter
    assert(bypass.collectFirst { case j: Join => j }.isEmpty,
      s"bypass branch must not join:\n$bypass")
    val probes = bypass.expressions.flatMap(_.collect {
      case b: BloomFilterMightContain => b
    })
    assert(probes.nonEmpty, s"bypass branch must carry the bloom probe:\n$bypass")
    // and the candidate branch does join (bloom false positives removed)
    assert(union.children.last.collectFirst { case j: Join => j }.nonEmpty)
  }

  test("bucketed co-located join needs no exchange on the join key") {
    val (o, l) = graft.queries.TableFixtures
      .bucketedTables(spark, "/root/testdata/sf0.001")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (broadcast would hide the co-location)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = spark.table(o)
        .join(spark.table(l), col("o_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("equality-MoR changelog resolves as a semi-join, never a state diff") {
    val loc = tmpDir("planq-mor")
    val t = GraftTable.create(spark, loc, "planqmor", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    t.createOrReplaceBranch("c1")
    t.deleteWhereMoR(col("txn_id").isin("txn3", "txn7"), Seq("txn_id"))
    t.createOrReplaceBranch("c2")
    val plan = t.changelogBetween("c1", "c2")
      .queryExecution.executedPlan.toString
    // the DELETE images come from one parent scan semi-joined against the
    // O(matched-keys) delete file — two full scans + exceptAll would show
    // up as an Except/HashAggregate-count shape here
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.toLowerCase.contains("except"),
      s"equality-MoR changelog must not fall back to the state diff:\n$plan")
    // positional twin: row-identity semi-join, same no-state-diff shape
    t.createOrReplaceBranch("c3")
    t.deleteWherePositional(col("txn_id") === "txn9")
    t.createOrReplaceBranch("c4")
    val posPlan = t.changelogBetween("c3", "c4")
      .queryExecution.executedPlan.toString
    assert(posPlan.contains("LeftSemi"), posPlan)
    assert(!posPlan.toLowerCase.contains("except"),
      s"positional-MoR changelog must not fall back to the state diff:\n$posPlan")
  }

  test("time-travel scan reads only the pinned snapshot's files") {
    table.createOrReplaceBranch("pin")
    table.append(ActivityData.day4(spark).filter(col("txn_id").isin("txn46", "txn47")))
    val pinned = table.asOf("pin").inputFiles.toSet
    val current = table.toDF.inputFiles.toSet
    assert(pinned.subsetOf(current) && pinned.size < current.size)
  }

  test("gramMatrix is one two-stage aggregation: partial gram buffers ride the shuffle, no row explosion") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = graft.ops.Pca.gramMatrix(e, "embedding", 64)
      .queryExecution.executedPlan.toString
    // partial_gram_matrix below the exchange = map-side O(d²) buffers;
    // the explode (Generate) touches the one already-reduced array
    assert(plan.contains("partial_gram_matrix"),
      s"expected a map-side partial gram aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("posexplode"),
      s"gram must never expand corpus rows:\n$plan")
    val genLines = plan.linesIterator.count(_.contains("Generate explode"))
    assert(genLines == 1, s"exactly one post-agg explode expected:\n$plan")
  }

  test("shardShuffle plans no Window and exactly one range exchange over the hash") {
    import spark.implicits._
    val d = (0L until 100L).map(i => Tuple1(i)).toDF("id")
    val out = graft.ops.Corpus.shardShuffle(d, "id", "s", 4, parts = 4)
    val plan = out.queryExecution.executedPlan.toString
    // the global rank comes from range-partition offsets + zipWithIndex,
    // never a single-partition Window.orderBy
    assert(!plan.contains("Window"),
      s"shardShuffle must not plan a global window:\n$plan")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning")
      || plan.contains("ExistingRDD"), // post-zipWithIndex plans start from the ranked RDD
      s"expected the range-sort rank pipeline:\n$plan")
  }

  test("lateral top-2 decorrelates to WindowGroupLimit + keyed equi-join") {
    val df = SparkEntry.queries("q36_lateral")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral subquery must decorrelate, not loop per row:\n$plan")
    // the LIMIT 2 lowers to map-side WindowGroupLimit (Partial before the
    // custkey exchange) and the correlation becomes a hash equi-join
    assert(plan.contains("WindowGroupLimit"),
      s"expected the per-group limit pushdown:\n$plan")
    assert(plan.contains("HashJoin [c_custkey") || plan.contains("Join [c_custkey"),
      s"expected the decorrelated custkey equi-join:\n$plan")
  }

  test("winsorize joins bounds by broadcast: the corpus never shuffles") {
    import spark.implicits._
    val d = (0L until 500L).map(i => (s"g${i % 3}", (i % 97).toDouble)).toDF("g", "v")
    val plan = graft.ops.Stats.winsorize(d, "v", Seq("g"), 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast bounds join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"winsorize must not shuffle or product-join the corpus:\n$plan")
    // the only hash exchange is the |groups|-row percentile aggregate's
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one (aggregate-side) exchange, got $exchanges:\n$plan")
  }

  test("madOutliers: both stat joins broadcast, corpus side unshuffled") {
    import spark.implicits._
    val d = (0L until 500L).map(i => (s"g${i % 3}", (i % 97).toDouble)).toDF("g", "v")
    val plan = graft.ops.Stats.madOutliers(d, "v", Seq("g"))
      .queryExecution.executedPlan.toString
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected broadcast median+MAD joins, got $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"madOutliers must not shuffle or product-join the corpus:\n$plan")
  }

  test("runningTotal plans no Window: prefix sums come from range-partition offsets") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, i % 9)).toDF("id", "v")
    val out = graft.ops.Corpus.runningTotal(d, Seq(col("id")), col("v"),
      "rt", parts = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"runningTotal must not plan a global window:\n$plan")
    assert(plan.contains("ExistingRDD"), // offsets pass feeds a ranked RDD
      s"expected the offset-ranked RDD pipeline:\n$plan")
  }

  test("zipfFit plans no Window: top-N via TakeOrdered, never a full-vocab sort") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.ops.TextAnalysis.zipfFit(docs, "text", topN = 100)
      .queryExecution.executedPlan.toString
    // a partition-less rank window here would serialize the ENTIRE
    // vocabulary (10^8+ terms at web scale) through one task before the
    // top-N cut; the top-N must lower to a distributed TakeOrdered and
    // only the <= topN survivors may touch a single task
    assert(!plan.contains("Window"),
      s"zipfFit must not plan any Window operator:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected the distributed top-N (TakeOrderedAndProject):\n$plan")
  }

  test("skyline finish is grid-partitioned: no single-partition exchange anywhere") {
    import spark.implicits._
    val pts = (0L until 1000L).map(i => (i % 97, (i * 31) % 89))
      .toDF("x", "y")
    val out = graft.ops.Skyline.skyline2D(pts, "x", "y", buckets = 16)
    // the old design finished with repartition(1), funneling every
    // candidate through one task; the grid finish ends bucket-partitioned
    // (the only SinglePartition exchanges left carry one-row-per-task
    // aggregate buffers — the percentile cuts — never candidate rows)
    assert(out.rdd.getNumPartitions > 1,
      "skyline output must stay bucket-partitioned, not single-task")
    val plan = out.queryExecution.executedPlan.toString
    // phase 1 (narrow prune) is the CACHED candidate RDD every grid pass
    // scans (ExistingRDD — computed once, ContextCleaner-reclaimed); the
    // per-bucket finish is a MapPartitions above the bucket exchange
    assert(plan.contains("ExistingRDD"),
      s"expected the cached phase-1 candidate RDD:\n$plan")
    assert(plan.linesIterator.exists(_.contains("MapPartitions")),
      s"expected the per-bucket finish MapPartitions:\n$plan")
  }

  test("bm25: query terms broadcast into the postings; no cartesian beyond 1-row scalars") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"tok${i % 7} tok${i % 11} filler$i"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "tok3 tok5")).toDF("qid", "qt")
    val out = graft.ops.TextAnalysis.bm25TopK(docs, "text", "doc_id",
      qs, "qid", "qt", k = 5)
    out.collect() // finalize AQE
    val plan = out.queryExecution.executedPlan.toString
    // the query-side prune and the scalar cross joins must all broadcast;
    // a shuffled or nested-loop join against the corpus postings would
    // scale with the corpus instead of the query workload
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"),
      s"bm25 must never plan a cartesian product:\n$plan")
  }

  test("pageRank iteration state is pinned RDDs; no cartesian products") {
    import spark.implicits._
    val edges = (0L until 300L).map(i => (s"n${i % 23}", s"n${(i * 7) % 23}"))
      .toDF("src", "dst")
    val out = graft.ops.Graph.pageRank(edges, "src", "dst", iters = 2)
    val plan = out.queryExecution.executedPlan.toString
    // per-iteration ranks / transition table / flagged node set are
    // RDD-level pins (ExistingRDD): without them the multi-consumer
    // lineage re-executes upstream exponentially in the iteration count
    assert(plan.contains("ExistingRDD"),
      s"expected pinned iteration state (ExistingRDD):\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pageRank must never plan a cartesian product:\n$plan")
  }

  test("mmrSelect: queries broadcast into one corpus scan; rerank is MapGroups over the pooled rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 200L).map(i =>
      (i, Seq.fill(6)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.mmrSelect(
      corpus.filter(col("vec_id") < 2), corpus, poolSize = 8, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    // relevance pass: corpus scanned once against broadcast queries —
    // never a shuffled join or cartesian of corpus rows
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"queries must broadcast into the corpus scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      s"no unbroadcast join of corpus rows:\n$plan")
    // greedy rerank runs per query inside a task over ≤poolSize rows
    assert(plan.contains("MapGroups"),
      s"rerank must be the in-task greedy pass:\n$plan")
    // the salted two-phase pool cut (salt window + per-query window) and
    // the per-query regroup — the O(pool²·d) work never adds exchanges
    // proportional to corpus size, and no window ever funnels the full
    // scored set into |queries| tasks
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges <= 3, s"expected ≤3 hash exchanges, got $exchanges:\n$plan")
    assert(plan.contains("pmod(hash(neighbor_id"),
      s"pool cut must be the salted two-phase top-k:\n$plan")
  }

  test("metadataDF: _file/_pos ride the scan; only the partition lookup joins, by broadcast") {
    val out = table.metadataDF
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"_partition must join from the broadcast file list:\n$plan")
    // no shuffle exchange: provenance must not re-partition the data read
    assert(!plan.contains("Exchange hashpartitioning"),
      s"metadataDF must not shuffle the scan:\n$plan")
    assert(plan.contains("file_path") || plan.contains("_metadata"),
      s"_file/_pos must come from parquet scan metadata:\n$plan")
  }

  test("silhouette (unrolled): zero-exchange map work — centroids are codegen literals") {
    import spark.implicits._
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i + d).toFloat))).toDF("vec_id", "embedding")
    val cents = (0 until 3).map(c =>
      (c.toLong, Array.tabulate(4)(d => (c * 2 + d).toFloat))).toDF("vec_id", "embedding")
    val plan = graft.ops.Similarity.silhouette(vecs, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"per-row silhouette must not shuffle or join the corpus:\n$plan")
  }

  test("cupedAbTest: scalar stats broadcast back; only nested-loop joins against 1-row sides") {
    import spark.implicits._
    val units = (0 until 200).map(i =>
      (i % 2, i.toDouble, i * 2.0 + (i * 7 % 13))).toDF("variant", "x_pre", "y_post")
    val out = graft.ops.Stats.cupedAbTest(units, "variant", "y_post", "x_pre")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the theta/mean and t attach are 1-row broadcasts; no shuffle join,
    // no cartesian against anything wider than a scalar row
    assert(!plan.contains("SortMergeJoin"),
      s"cupedAbTest must not shuffle-join:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"scalar stats must attach by broadcast:\n$plan")
  }

  test("coOccurrenceEdges sizes cells BEFORE collecting members (hot-cell guard)") {
    import spark.implicits._
    val occ = (1L to 100L).map(u => (u, "c" + (u % 7))).toDF("u", "cell")
    val df = graft.ops.Graph.coOccurrenceEdges(occ, "u", Seq("cell"),
      minCells = 1, maxCellSize = 50)
    val plan = df.queryExecution.optimizedPlan.toString
    // the member-collecting aggregate must sit ABOVE the cell-size
    // filter in the plan tree: collect_list over unguarded cells is
    // exactly the |cell|^2 hazard the guard exists to bound. The size
    // aggregate itself is count-only — it must never collect members.
    val collectIdx = plan.indexOf("collect_list")
    assert(collectIdx >= 0, s"expected a bounded collect_list:\n$plan")
    val filterIdx = plan.indexOf("__c")
    assert(filterIdx > collectIdx,
      s"cell-size guard must be below (downstream input of) the member " +
        s"collection:\n$plan")
    assert(plan.indexOf("collect_list", collectIdx + 1) < 0,
      s"only ONE member-collecting aggregate expected:\n$plan")
  }
}
