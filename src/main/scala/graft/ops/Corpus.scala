package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-assembly operators for training-data pipelines: PII redaction,
 * fixed-size token chunking, and deterministic stratified sampling — the
 * prepare/split/mix stages that run after dedup and quality filtering.
 *
 * Everything is codegen-friendly `Column` work (regexp_replace /
 * explode+slice / pmod filters): per-row map transforms with no shuffle of
 * their own, so they pipeline into whatever aggregation or write follows.
 * Patterns stick to regex features with identical semantics in Java regex
 * (Spark) and RE2 (DuckDB) so the oracle can mirror them.
 */
object Corpus {

  // --- PII redaction -----------------------------------------------------

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}-\\d{4}\\b"

  def redactEmails(text: Column): Column =
    regexp_replace(text, lit(emailPattern), lit("<EMAIL>"))

  def redactPhones(text: Column): Column =
    regexp_replace(text, lit(phonePattern), lit("<PHONE>"))

  /** Order matters: emails first so their digit runs can't half-match the
    * phone pattern afterwards. */
  def redactPii(text: Column): Column = redactPhones(redactEmails(text))

  /** How many matches of `pattern` the redaction would replace. */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  // --- fixed-size token chunking ----------------------------------------

  /**
   * Split each document into chunks of at most `chunkSize` whitespace
   * tokens (the context-window packing precursor). One output row per
   * chunk with `chunk_idx`, `chunk_tokens`, `chunk_text`; every input
   * column is kept. The explode is narrow — no shuffle — and slices
   * reference the tokenized array once per row.
   *
   * `stride` sets how far consecutive chunk STARTS are apart: the default
   * (`chunkSize`) tiles the document with no overlap; `stride < chunkSize`
   * gives sliding-window chunks overlapping by `chunkSize - stride`
   * tokens — the retrieval-index shape that keeps a sentence from being
   * split across chunk boundaries unseen. A last window shorter than the
   * full size is still emitted (tail coverage), but never one that starts
   * past the end.
   */
  def chunkByTokens(df: DataFrame, textCol: String,
      chunkSize: Int, stride: Int = 0): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val step = if (stride <= 0) chunkSize else stride
    require(step <= chunkSize,
      s"stride ($step) beyond chunkSize ($chunkSize) would skip tokens")
    // starts advance by step until a window reaches the document end:
    // ceil((size-chunkSize)/step)+1 windows — tail-coverage semantics, so
    // redundant suffix windows fully inside the last one are not emitted;
    // capped below by 1 so an empty/short doc still yields its single chunk
    val nChunks = greatest(lit(1), (floor(
      (size(col("__tk")) - lit(chunkSize) + lit(step - 1)) / lit(step)) + 1).cast("int"))
    df.withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .withColumn("chunk_idx",
        explode(sequence(lit(0), nChunks - 1)))
      .withColumn("__chunk",
        slice(col("__tk"), col("chunk_idx") * step + 1, lit(chunkSize)))
      .withColumn("chunk_tokens", size(col("__chunk")))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .drop("__tk", "__chunk")
  }

  // --- cross-document boilerplate removal --------------------------------

  /**
   * CCNet/RefinedWeb-style boilerplate strip: REWRITE each document,
   * dropping every `segTokens`-token segment whose exact normalized text
   * occurs in at least `maxDocFreq` distinct documents (navigation chrome,
   * cookie banners, license footers — the content that repeats verbatim
   * across a crawl and poisons LM training if left in). This is the
   * rewrite companion of the chunk-level DEDUP ops ([[chunkByTokens]] +
   * Dedup): those pick one representative per duplicate chunk; this one
   * cleans the documents themselves and keeps them all.
   *
   * Output: one row per input document — `idCol`, `clean_text` (surviving
   * segments rejoined in order; empty string when everything was
   * boilerplate), `kept_segments`, `dropped_segments`, `dropped_tokens`.
   *
   * Scale shape: tile into segments (narrow explode), count distinct-doc
   * frequency per segment (one segment-keyed exchange with map-side
   * partial distinct), anti-tag against the >=maxDocFreq set (a
   * dictionary-sized join side at web scale — boilerplate is by
   * definition the heavy tail's head — so AQE broadcasts it), then one
   * doc-keyed exchange rebuilds the text (per-doc state is bounded by the
   * document's own length). Never doc x doc, never a global window; at
   * 1000 executors every stage is fully parallel.
   */
  def stripBoilerplate(df: DataFrame, textCol: String, idCol: String,
      segTokens: Int = 8, maxDocFreq: Long = 3L): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive, got $segTokens")
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2, got $maxDocFreq")
    val nSegs = (floor((size(col("__tk")) + lit(segTokens - 1)) / lit(segTokens))).cast("int")
    val segs = df
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .withColumn("__i", explode(sequence(lit(0), greatest(lit(1), nSegs) - 1)))
      .select(col(idCol),
        col("__i"),
        array_join(slice(col("__tk"), col("__i") * segTokens + 1, lit(segTokens)), " ").as("__seg"),
        size(slice(col("__tk"), col("__i") * segTokens + 1, lit(segTokens))).as("__n"))
    // distinct-doc frequency; keep only the boilerplate survivors (the
    // join side stays dictionary-sized — segments above the threshold)
    val boiler = segs.select(col("__seg"), col(idCol)).distinct()
      .groupBy(col("__seg")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= maxDocFreq)
      .select(col("__seg"), lit(true).as("__boiler"))
    val tagged = segs.join(boiler, Seq("__seg"), "left")
      .withColumn("__b", coalesce(col("__boiler"), lit(false)))
    tagged.groupBy(col(idCol))
      .agg(
        // collect_list skips nulls: only kept segments enter the array;
        // array_sort on struct(__i, __seg) restores document order
        array_join(transform(
          array_sort(collect_list(when(!col("__b"),
            struct(col("__i"), col("__seg"))))),
          s => s.getField("__seg")), " ").as("clean_text"),
        count(when(!col("__b"), lit(1))).as("kept_segments"),
        count(when(col("__b"), lit(1))).as("dropped_segments"),
        coalesce(sum(when(col("__b"), col("__n"))), lit(0L))
          .cast("long").as("dropped_tokens"))
  }

  // --- sequence packing --------------------------------------------------

  /**
   * GPT-style sequence-packing plan: per shard, documents are concatenated
   * in `idCol` order into one token stream that is cut into fixed
   * `budget`-token packs; each document's span maps onto the packs it
   * occupies (documents straddle pack boundaries, exactly like
   * concat-then-chunk training-data packing). Adds to each row:
   *
   *  - `tokens`:     whitespace token count
   *  - `tok_start`:  the document's start offset in its shard's stream
   *                  (exclusive running sum)
   *  - `pack_first` / `pack_last`: first/last pack index the span touches
   *
   * Scale: `shard` should hash-assign documents (default
   * `pmod(xxhash64(id), nShards)`), so the only non-narrow work is one
   * window per shard — partitionBy(shard).orderBy(id) sorts each shard
   * independently; no global ordering or single-reducer stage exists. The
   * writer that materializes packs then partitions by (shard, pack).
   */
  def packAssignments(df: DataFrame, textCol: String, idCol: String,
      budget: Int, nShards: Int, shard: Option[Column] = None): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(nShards > 0, s"shard count must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val shardCol = shard.getOrElse(pmod(xxhash64(col(idCol)), lit(nShards)))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shardCol)
      .withColumn("tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("tok_start", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("pack_first", floor(col("tok_start") / budget))
      .withColumn("pack_last",
        floor((col("tok_start") + col("tokens") - 1) / budget))
  }

  // --- deterministic stratified sampling --------------------------------

  private def fractionFor(strataCol: String,
      fractions: Map[String, Double], default: Double): Column = {
    fractions.foreach { case (k, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction for $k out of [0,1]: $f") }
    fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
  }

  /**
   * Stratified corpus mixing, mod-bucket variant: keep a row iff
   * `key mod buckets` falls under its stratum's fraction. Fully
   * deterministic and reproducible from the raw ids (the property corpus
   * mixes are audited on), and exactly mirrorable in SQL. Use when keys are
   * assigned independently of the stratum (as synthetic doc ids are);
   * sequential-id correlation artifacts are what [[stratifiedSample]]'s
   * hashed buckets remove.
   */
  def stratifiedSampleMod(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      buckets: Int = 1000): DataFrame = {
    val frac = fractionFor(strataCol, fractions, defaultFraction)
    df.filter(pmod(col(keyCol), lit(buckets)) < frac * buckets)
  }

  /**
   * Stratified sampling on hashed buckets (`xxhash64(key, salt)`): the
   * production variant — bucket assignment is decorrelated from any
   * structure in the key space, and changing the salt draws an independent
   * sample. Same determinism guarantees given (key, salt).
   */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      buckets: Int = 1000, salt: Long = 0L): DataFrame = {
    val frac = fractionFor(strataCol, fractions, defaultFraction)
    df.filter(pmod(xxhash64(col(keyCol), lit(salt)), lit(buckets)) < frac * buckets)
  }

  /**
   * Deterministic holdout split (train/val/test) on hashed key buckets —
   * the leakage-safe split: assignment is a pure function of (key, salt),
   * so re-runs, late-arriving data and different cluster sizes produce
   * the identical split and no row drifts between splits across runs.
   * Fractions must sum to <= 1; remainder buckets land in the FIRST
   * split. Narrow — one projected column, no shuffle.
   */
  def holdoutSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split",
      buckets: Int = 1000, salt: Long = 0L): DataFrame =
    assignSplit(df, pmod(xxhash64(col(keyCol), lit(salt)), lit(buckets)),
      splits, splitCol, buckets)

  /** [[holdoutSplit]] with plain mod buckets (`key mod buckets`) instead
    * of hashed ones — exactly mirrorable in SQL for the oracle; use the
    * hashed variant when key structure could correlate with content. */
  def holdoutSplitMod(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split",
      buckets: Int = 1000): DataFrame =
    assignSplit(df, pmod(col(keyCol), lit(buckets)), splits, splitCol, buckets)

  private def assignSplit(df: DataFrame, bucket: Column,
      splits: Seq[(String, Double)], splitCol: String, buckets: Int): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions sum to ${splits.map(_._2).sum} > 1")
    val cum = splits.map(_._1).zip(splits.scanLeft(0.0)(_ + _._2).tail)
    val assign = cum.foldLeft(Option.empty[Column]) {
      case (None, (name, hi)) => Some(when(bucket < hi * buckets, name))
      case (Some(c), (name, hi)) => Some(c.when(bucket < hi * buckets, name))
    }.get.otherwise(splits.head._1)
    df.withColumn(splitCol, assign)
  }

  // --- domain-mixture balancing ------------------------------------------

  /**
   * Domain-mixture balancing — the "data mixing" stage of a pretraining
   * pipeline (The Pile / DoReMi-style per-source weights, here with the
   * simplest defensible target): derive each domain's keep fraction as
   * `min_domain_tokens / domain_tokens`, so after sampling every domain
   * contributes roughly the token mass of the smallest one, then keep rows
   * by the deterministic mod-bucket rule of [[stratifiedSampleMod]].
   *
   * Returns the input rows that survive, plus a `keep_frac` column (the
   * domain's fraction) for auditability. Fractions and keep decisions are
   * derived only from the raw table, so the entire mix is replayable in
   * plain SQL.
   *
   * Scale shape: one narrow pass computes token counts; the per-domain
   * totals are a map-side-combined aggregate that shuffles only
   * n_domains rows; the global min and the fraction table come back via
   * broadcast joins — the full corpus is never shuffled.
   */
  def balanceToSmallest(df: DataFrame, textCol: String, domainCol: String,
      keyCol: String, buckets: Int = 1000000): DataFrame = {
    val tok = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val domTokens = df.groupBy(col(domainCol))
      .agg(sum(tok).as("__dom_tokens"))
    val minTok = domTokens.agg(min(col("__dom_tokens")).as("__min_tokens"))
    val fracs = domTokens.crossJoin(broadcast(minTok))
      .select(col(domainCol).as("__dom"),
        (col("__min_tokens").cast("double") / col("__dom_tokens").cast("double"))
          .as("keep_frac"))
    // null-safe domain match: groupBy keeps a NULL-domain group with its
    // own keep_frac, and an equi-join would silently drop every
    // NULL-domain row instead of applying it
    df.join(broadcast(fracs), df(domainCol) <=> fracs("__dom"))
      .drop("__dom")
      .filter(pmod(col(keyCol), lit(buckets)) < col("keep_frac") * buckets)
  }

  /**
   * Temperature-based domain mixture (the mT5 / XLM-R multilingual
   * sampling formula, public literature: Conneau et al. 2020 §3.1): the
   * target token share of domain d is `tokens_d^alpha / Σ tokens^alpha`,
   * scaled to `tokenBudget` — `alpha = 1` keeps the natural distribution,
   * `alpha → 0` flattens toward uniform, between the two it up-weights
   * low-resource domains without the hard flatten of
   * [[balanceToSmallest]]. No upsampling: `keep_frac_d =
   * min(1, target_d / tokens_d)`, and keep decisions are deterministic
   * `doc_id mod buckets` thresholds exactly like the other mixers, so the
   * whole mix replays in plain SQL from the raw table.
   *
   * `alpha = 0.5` (the common choice) is computed with `sqrt`, which IEEE
   * 754 requires to be CORRECTLY rounded — bit-identical across engines —
   * whereas `pow` is only within 1 ulp on some libms; the verified config
   * uses 0.5 so the oracle's arithmetic is exactly reproducible.
   *
   * Scale shape: identical to [[balanceToSmallest]] — one narrow
   * token-count pass, an n_domains-row aggregate, fractions broadcast
   * back; the corpus itself never shuffles.
   */
  def temperatureMix(df: DataFrame, textCol: String, domainCol: String,
      keyCol: String, alpha: Double, tokenBudget: Long,
      buckets: Int = 1000000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val tok = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val domTokens = df.groupBy(col(domainCol))
      .agg(sum(tok).as("__dom_tokens"))
    def weight(c: Column): Column =
      if (alpha == 0.5) sqrt(c.cast("double")) else pow(c.cast("double"), alpha)
    val totPow = domTokens.agg(sum(weight(col("__dom_tokens"))).as("__tot_pow"))
    val fracs = domTokens.crossJoin(broadcast(totPow))
      .select(col(domainCol).as("__dom"),
        least(lit(1.0),
          lit(tokenBudget.toDouble) * weight(col("__dom_tokens"))
            / col("__tot_pow") / col("__dom_tokens").cast("double"))
          .as("keep_frac"))
    // null-safe domain match (same reasoning as balanceToSmallest)
    df.join(broadcast(fracs), df(domainCol) <=> fracs("__dom"))
      .drop("__dom")
      .filter(pmod(col(keyCol), lit(buckets)) < col("keep_frac") * buckets)
  }

  // --- deterministic training-shard shuffle ------------------------------

  /**
   * Deterministic seeded global shuffle into training shards — the
   * "shuffle the corpus, cut it into N equal shard files" export step
   * every pretraining run needs, made reproducible: order is the md5 of
   * `(id, seed)`, so any re-run (or late re-export of one shard) produces
   * byte-identical shard membership and in-shard positions from the raw
   * ids alone. Changing the seed draws an independent permutation.
   *
   * Adds `shard` (1..nShards, ntile semantics: sizes differ by at most
   * one, larger shards first) and `pos` (1-based position inside the
   * shard, in shuffled order).
   *
   * Scale shape: the global order is materialized as
   * `repartitionByRange(hash) + sortWithinPartitions` — a terasort-style
   * range sort where every task sorts only its slice — and the global
   * rank falls out of partition offsets + local positions, NEVER a
   * single-partition `Window.orderBy`. N comes from a partition-size pass
   * over the post-shuffle data (shuffle files, not the input lineage).
   * One range shuffle total; the downstream shard writer partitions by
   * `shard` and streams each file in `pos` order.
   */
  def shardShuffle(df: DataFrame, idCol: String, seed: String,
      nShards: Int, parts: Int = 32): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val hashed = df.withColumn("__h",
      md5(concat(col(idCol).cast("string"), lit(":" + seed))))
    // idCol is the tie-break: duplicate ids hash identically, and without
    // a secondary key their relative order (hence pos / shard at shard
    // boundaries) would be nondeterministic across runs. With the id as
    // tie-break the order is a deterministic total order whenever idCol is
    // unique (the documented contract); exact duplicate ids remain
    // interchangeable with each other only.
    val sorted = hashed.repartitionByRange(parts, col("__h"))
      .sortWithinPartitions(col("__h"), col(idCol))
    // N and the global ranks both come from the POST-SHUFFLE data: a
    // partition-size pass plus an offset-stamped pass, each re-reading the
    // shuffle files (never the upstream plan — a separate df.count() here
    // would re-execute the whole input lineage a third time; for derived
    // inputs that is a full extra corpus pass, not a metadata read).
    // UnsafeRow passes (r18): same two-pass offset scheme, minus the boxed
    // Row conversion both passes paid and the per-row Row.fromSeq rebuild
    // of the stamping pass — see runningTotal for the pattern
    val rdd = org.apache.spark.sql.graft.bridge.toInternalRdd(sorted)
    val sizes = rdd.mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.size.toLong)), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val n = sizes.sum
    val offsets = sizes.scanLeft(0L)(_ + _)
    val rankedSchema = sorted.schema
      .add("__rank", org.apache.spark.sql.types.LongType, nullable = false)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(rankedSchema)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val tail = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      var k = offsets(i)
      it.map { row => k += 1
        tail.update(0, k)
        proj(joined(row, tail)): org.apache.spark.sql.catalyst.InternalRow }
    }
    val spark = df.sparkSession
    val rdf = org.apache.spark.sql.graft.bridge
      .internalCreateDataFrame(spark, ranked, rankedSchema)
    // SQL ntile(n): q = N/n size floor, first r = N%n shards take q+1
    val q = n / nShards
    val r = n % nShards
    val rank = col("__rank")
    val shard1 =
      if (q == 0) rank // fewer rows than shards: one row per leading shard
      else {
        val firstBlock = r * (q + 1)
        when(rank <= firstBlock, floor((rank - 1) / (q + 1)))
          .otherwise(lit(r) + floor((rank - lit(firstBlock) - 1) / q)) + 1
      }
    val start0 = (shard1 - 1) * q + least(shard1 - 1, lit(r)) // 0-based
    rdf.withColumn("shard", shard1.cast("int"))
      .withColumn("pos", (rank - start0).cast("long"))
      .drop("__h", "__rank")
  }

  // --- exact-count stratified take ----------------------------------------

  /**
   * Deterministic exact-n-per-stratum subset — the "balanced evaluation
   * set" draw (fractions give you proportions; this gives you COUNTS):
   * within each stratum, rows are ranked by the md5 of `(key, salt)` and
   * the first `n` kept, with the rank exposed as `draw_rank`. Pure
   * function of (key, salt): re-runs and re-partitionings reproduce the
   * identical subset; a new salt redraws it. Strata with fewer than `n`
   * rows keep everything.
   *
   * Scale shape: the rank-filter lowers to WindowGroupLimit — each task
   * keeps at most `n` rows per stratum BEFORE the stratum shuffle, so the
   * exchange carries O(strata · n · tasks-per-stratum) rows, not the
   * corpus (same plan family as the q32 per-group top-k).
   */
  def stratifiedTake(df: DataFrame, strataCol: String, keyCol: String,
      n: Int, salt: String): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val draw = md5(concat(col(keyCol).cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(draw.asc, col(keyCol).asc)
    df.withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= n)
  }

  // --- deterministic weighted sampling ------------------------------------

  /**
   * Deterministic weighted sampling without replacement
   * (Efraimidis–Spirakis exponential-clocks form): each row draws a
   * reproducible uniform `u in (0,1)` from the md5 of `(key, salt)` and
   * gets priority `-ln(u) / weight`; the `k` SMALLEST priorities are the
   * sample. Inclusion probability is proportional to weight (quality-
   * weighted corpus subsetting), yet the draw is a pure function of
   * (key, salt) — re-runs, re-partitionings and late data reproduce the
   * identical sample, and changing the salt draws an independent one.
   *
   * Scale shape: the priority is narrow per-row expression work and the
   * top-k lowers to `TakeOrderedAndProject` — per-partition partial top-k,
   * then a k-row merge on the driver; no shuffle of the corpus. Weights
   * must be strictly positive (enforced).
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // h in [0, 2^32): u = (h+1)/(2^32+1) lands strictly inside (0,1)
    val h = conv(substring(md5(concat(col(keyCol).cast("string"),
      lit(":" + salt))), 1, 8), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967297.0)
    val w = col(weightCol)
    val priority = -log(u) / w
    df.withColumn("priority",
        when(w.isNull || w <= 0,
          raise_error(concat(lit("weightedSample: non-positive weight for key "),
            col(keyCol).cast("string")))).otherwise(priority))
      .orderBy(col("priority").asc, col(keyCol).asc)
      .limit(k)
  }

  // --- scalable global prefix sums / budget selection ---------------------

  /**
   * Scalable global running total of an integer-valued column under a
   * total order — the primitive behind budget-constrained selection and
   * cumulative-coverage curves. `orderCols` MUST be a total order (include
   * a unique tie-break column) or the cumulative values are
   * partitioning-dependent.
   *
   * Scale shape: terasort-style, like [[shardShuffle]] — ONE
   * `repartitionByRange(orderCols) + sortWithinPartitions` range shuffle;
   * per-partition sums (a `parts`-bounded collect of one long each) become
   * running offsets, and each sorted task adds its offset to a local
   * running sum. There is NO single-partition `Window.orderBy` anywhere —
   * the global prefix sum costs one range shuffle regardless of corpus
   * size. Null values count as 0.
   */
  def runningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      outCol: String = "running_total", parts: Int = 32): DataFrame = {
    require(parts >= 1, s"parts must be positive, got $parts")
    val spark = df.sparkSession
    val withV = df.withColumn("__rt_v", coalesce(valueCol.cast("long"), lit(0L)))
    val sorted = withV.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = sorted.schema.fieldIndex("__rt_v")
    // both passes run on the executed plan's UnsafeRows (r18): the
    // previous `.rdd` form converted every field of every row to boxed
    // external objects TWICE — once per pass — and the stamping pass
    // re-boxed each row a third time via Row.fromSeq(row.toSeq :+ run).
    // The InternalRow RDD is the same lazily-cached lineage `.rdd` shared
    // (one shuffle, two reads of its files), minus all conversion.
    val rdd = org.apache.spark.sql.graft.bridge.toInternalRdd(sorted)
    // pass 1: one long per partition (reads the same shuffle output the
    // ranking pass below re-reads — no recomputation of the input scan)
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(i) = sum of partitions < i
    val outSchema = sorted.schema
      .add(outCol, org.apache.spark.sql.types.LongType, nullable = false)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(outSchema)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val tail = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      var run = offsets(i)
      it.map { row =>
        run += row.getLong(vIdx)
        tail.update(0, run)
        proj(joined(row, tail)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.graft.bridge
      .internalCreateDataFrame(spark, ranked, outSchema)
      .drop("__rt_v")
  }

  /**
   * Greedy budget-constrained selection — the "take the best documents
   * until the token budget is spent" data-selection step (quality-ranked
   * corpus truncation). Rows are ordered by `orderCols` (best first; the
   * caller supplies the priority and a unique tie-break) and the PREFIX
   * whose cumulative `valueCol` stays within `budget` is kept; the first
   * row that would overflow the budget ends the selection (strict prefix
   * semantics — later smaller rows are NOT pulled forward, which keeps
   * the result a pure function of the order and exactly mirrorable as a
   * windowed cumulative sum in SQL).
   *
   * Adds the cumulative column (`cumCol`) for auditability. Same
   * one-range-shuffle scale shape as [[runningTotal]].
   */
  def selectToBudget(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      budget: Long, cumCol: String = "cum_value", parts: Int = 32): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    // the prefix filter is only a prefix when the cumulative sum is
    // monotonic — a negative value would let later rows duck back under
    // the budget and the filter would keep a NON-prefix subset. Guarded
    // inline (codegen'd per row, no extra pass).
    val guarded = when(valueCol < lit(0), raise_error(concat(
        lit("selectToBudget: negative value breaks prefix semantics: "),
        valueCol.cast("string"))))
      .otherwise(valueCol)
    runningTotal(df, orderCols, guarded, cumCol, parts)
      .filter(col(cumCol) <= budget)
  }

  // --- DSIR importance resampling -----------------------------------------

  /**
   * DSIR (Data Selection via Importance Resampling — Xie et al. 2023,
   * public literature) log importance weights over hashed unigram
   * features. The method: hash every token into `buckets` feature slots,
   * fit two smoothed multinomials over the slots — `p` from the TARGET
   * subset (the distribution you want more of, e.g. high-quality English)
   * and `q` from the RAW pool — then score each document by
   * `log w(x) = Σ_tokens [ log p_f − log q_f ]`. Resampling the corpus
   * proportionally to `w` (e.g. via [[weightedSample]] on `exp` of a
   * temperature-scaled weight, or a Gumbel top-k) shifts the pool toward
   * the target distribution.
   *
   * Feature hashing uses the first 8 hex chars of md5 — the repo-wide
   * deterministic-hash convention (same value in any engine, so re-runs
   * and cross-engine replays agree; Spark's murmur3 would be private to
   * Spark). Laplace smoothing `prior` keeps unseen-slot ratios finite.
   *
   * Scale shape: one explode over tokens; the feature-distribution fit is
   * a `buckets`-bounded hash aggregate (map-side combine does almost all
   * of it); the per-slot log-ratios broadcast back (`buckets` rows); the
   * per-document sum is the ONE data-sized exchange (doc-keyed, partially
   * aggregated map-side). Nothing is ever keyed by raw vocabulary, so a
   * 10^8-term web corpus costs the same metadata as this fixture.
   */
  def dsirScores(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 2048, prior: Double = 0.5): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(prior > 0.0, s"prior must be positive, got $prior")
    // single-task small scans serialize the tokenize+explode front —
    // repair parallelism first (no-op on already-parallel inputs)
    val toks = Par.fanOut(df, col(idCol))
      .select(col(idCol), isTarget.as("__t"),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
    val feat = pmod(
      conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))
    val featured = toks.select(col(idCol), col("__t"), feat.as("__f"))
    // one pass fits BOTH distributions: target occurrences and raw
    // occurrences per feature slot
    val counts = featured.groupBy(col("__f"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
        count(lit(1)).as("__rc"))
    val totals = counts.agg(
      sum(col("__tc")).cast("double").as("__T"),
      sum(col("__rc")).cast("double").as("__R"))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("__f"),
        (log((col("__tc") + lit(prior)) / (col("__T") + lit(prior * buckets))) -
          log((col("__rc") + lit(prior)) / (col("__R") + lit(prior * buckets))))
          .as("__lr"))
    featured.join(broadcast(ratios), Seq("__f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__lr")).as("dsir_logweight"))
  }

  // --- the composed pipeline --------------------------------------------

  /**
   * The full corpus-preparation pipeline, composed end to end:
   * quality-filter → exact-dedup → redact → stratified-sample → chunk.
   * One hash shuffle total (the dedup's digest window); everything else is
   * narrow map work fused around it, so the pipeline cost is one pass plus
   * one shuffle of (digest, id) pairs regardless of how many stages run.
   * Emits chunk rows ready for a training-shard write.
   */
  def prepareCorpus(df: DataFrame, textCol: String, idCol: String,
      strataCol: String, minQuality: Double,
      fractions: Map[String, Double], chunkSize: Int,
      sampleBuckets: Int = 1000): DataFrame = {
    // (r17 note: a Par.fanOut here measured SLOWER — the pipeline's first
    // exchange is the dedup digest shuffle right after the filter, so the
    // extra full-text exchange buys nothing; left as-is deliberately)
    val filtered = df.filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
    val deduped = Dedup.exactDedup(filtered, textCol, idCol)
    val redacted = deduped.withColumn(textCol, redactPii(col(textCol)))
    val sampled = stratifiedSampleMod(redacted, strataCol, idCol,
      fractions, buckets = sampleBuckets)
    chunkByTokens(sampled, textCol, chunkSize)
  }
}
