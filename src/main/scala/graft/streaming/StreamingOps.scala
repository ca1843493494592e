package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming counterparts of the batch event operators: the same
 * `events` schema consumed as an unbounded stream, with watermarked window
 * aggregation and stateful gap-sessionization via
 * `flatMapGroupsWithState` (the Spark-native continuous form of
 * graft.ops.Sessionize).
 *
 * Scale notes: state is partitioned by user_id (the natural key); the
 * watermark bounds state size for window aggs, and the session state
 * per key is O(1) (an open-session summary, not the event list).
 */
object StreamingOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionUpdate(user_id: Long, session_id: Long, n_events: Long,
      duration_ms: Long, total_value: Double, closed: Boolean)

  /** state record — must stay public for the state encoder's codegen */
  case class OpenSession(sessionId: Long, startMs: Long, lastMs: Long,
      nEvents: Long, totalValue: Double)

  /**
   * Tumbling-window counts per event type with a watermark bounding state:
   * the streaming analogue of the `e_daily` batch query.
   */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Summary key recording the micro-batch id an append snapshot committed;
    * the replay check reads it back for exactly-once. */
  val BatchIdSummaryKey = "streaming-batch-id"

  /** Summary key recording WHICH stream committed the batch: batch ids are
    * only unique per checkpoint, so the replay check must never compare ids
    * across different streams (a recreated checkpoint restarts at 0; a
    * second writer has its own sequence). */
  val StreamIdSummaryKey = "streaming-stream-id"

  /** Stable stream identity. The PRIMARY identity is the streaming query
    * id persisted in the checkpoint (read from the `sql.streaming.queryId`
    * local property Structured Streaming sets on the micro-batch thread):
    * it survives restarts of the same checkpoint and — critically —
    * CHANGES when a checkpoint is deleted and recreated at the same path,
    * where batch ids restart at 0 and a path-keyed guard would silently
    * drop every fresh batch as a replay. The fallback (direct test calls,
    * no streaming thread) hashes the NORMALIZED checkpoint URI, so
    * `/tmp/cp`, `/tmp/cp/` and `file:///tmp/cp` — which Spark resolves to
    * one checkpoint — share one identity. */
  private[streaming] def streamId(checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val normalized = p.getFileSystem(conf).makeQualified(p).toString
      .stripSuffix("/")
    java.security.MessageDigest.getInstance("MD5")
      .digest(normalized.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** The identity to stamp at COMMIT time: the checkpoint's query id when
    * running inside a streaming micro-batch, else `fallback`. */
  private[streaming] def runtimeStreamId(spark: org.apache.spark.sql.SparkSession,
      fallback: String): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse(fallback)

  /** The newest batch id this stream has committed to `table`, read back
    * from the snapshot summaries — the exactly-once replay guard both
    * streaming sinks consult. */
  private[streaming] def lastCommittedBatchId(table: graft.table.GraftTable,
      streamId: String): Option[Long] =
    table.meta.snapshots
      .filter(_.summary.get(StreamIdSummaryKey).contains(streamId))
      .flatMap(_.summary.get(BatchIdSummaryKey)).map(_.toLong).maxOption

  /**
   * Stream into a snapshot-versioned graft table: every micro-batch becomes
   * one atomic snapshot commit (append, or merge-upsert when `mergeKeys` is
   * given), so readers always see a consistent version and time travel /
   * WAP work on streaming ingestion exactly as on batch loads. This is the
   * `foreachBatch` idiom — the streaming analogue of the reference's daily
   * micro-ingestion loop.
   *
   * Exactly-once: Structured Streaming re-delivers the in-flight batch
   * after a restart, so append mode stamps each commit with its batch id
   * AND its stream identity ([[BatchIdSummaryKey]] / [[StreamIdSummaryKey]]
   * in the snapshot summary — the identity is the checkpoint location, the
   * same thing that defines a resumable query) and skips any batch at or
   * below the last id stamped BY THE SAME STREAM — the data write and the
   * "already delivered" marker land in ONE atomic snapshot commit, the
   * idempotent-sink contract foreachBatch requires. Scoping the check to
   * the stream matters: batch ids restart at 0 under a fresh checkpoint
   * and a second query writing the same table has its own sequence, so a
   * global max would silently drop fresh batches as "replays". Merge mode
   * is naturally idempotent (re-upserting the same keyed rows is a no-op)
   * but stamps and skips too, saving the replayed probe work. The check
   * scans retained snapshots: expire_snapshots keeps far more history than
   * the one in-flight batch a restart can replay.
   *
   * CDC apply: a change feed delivers MANY versions of a key per
   * micro-batch; pass `latestBy` (ordering columns, descending priority)
   * with `mergeKeys` to reduce each batch to its latest version per key
   * before the merge — the reduce-then-merge idiom that turns a change
   * stream into an always-current table. Without it, multi-version
   * batches fail fast on the merge cardinality guard rather than
   * silently multiplying rows.
   */
  def writeToGraftTable(df: DataFrame, table: graft.table.GraftTable,
      checkpointDir: String, mergeKeys: Seq[String] = Seq.empty,
      updateCols: Seq[String] = Seq.empty,
      latestBy: Seq[String] = Seq.empty,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      outputMode: String = "append")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(latestBy.isEmpty || mergeKeys.nonEmpty,
      "latestBy is a merge-mode reduction; pass mergeKeys with it")
    // `update` pairs a stateful aggregation with a keyed MERGE sink: each
    // trigger emits the CUMULATIVE state of every touched key, so the
    // upsert leaves the sink holding final values without waiting for the
    // watermark to finalize windows (append mode would never deliver the
    // tail windows of a bounded backfill)
    require(outputMode == "append" || (outputMode == "update" && mergeKeys.nonEmpty),
      s"outputMode=$outputMode needs mergeKeys (update rows must upsert, not append)")
    val sid = streamId(checkpointDir)
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitMicroBatch(table, batch, batchId, mergeKeys, updateCols,
          runtimeStreamId(batch.sparkSession, sid), latestBy); ()
      }
    // Trigger.AvailableNow turns the sink into a run-to-completion backfill
    // (process everything available, then stop) — the shape the st_ingest
    // oracle query drives synchronously
    trigger.fold(writer)(writer.trigger).start()
  }

  /** One micro-batch commit with the replay guard; factored out so the
    * exactly-once behavior is directly testable. Returns true when the
    * batch committed, false when it was recognized as a replay of an
    * earlier commit from the same stream. */
  private[streaming] def commitMicroBatch(table: graft.table.GraftTable,
      batch: DataFrame, batchId: Long, mergeKeys: Seq[String],
      updateCols: Seq[String], streamId: String,
      latestBy: Seq[String] = Seq.empty): Boolean = {
    val lastCommitted = lastCommittedBatchId(table, streamId)
    val stamp = Map(BatchIdSummaryKey -> batchId.toString,
      StreamIdSummaryKey -> streamId)
    if (lastCommitted.exists(_ >= batchId)) false
    else if (mergeKeys.isEmpty) {
      table.append(batch, extraSummary = stamp)
      true
    } else {
      // CDC apply: a change feed carries MANY versions of a key per
      // micro-batch, but SQL MERGE (and GraftTable.merge's cardinality
      // guard) requires at most one source row per target row — so reduce
      // the batch to the latest version per key first, ordered by
      // `latestBy` (ties broken by its later columns). The window is
      // partitioned by the merge keys, so the reduction shuffles at most
      // once on the same keys the merge join needs anyway — no extra
      // exchange shape at scale, state stays in the sink table itself.
      val reduced =
        if (latestBy.isEmpty) batch
        else {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(mergeKeys.map(col): _*)
            .orderBy(latestBy.map(col(_).desc): _*)
          batch.withColumn("__graft_rn", row_number().over(w))
            .filter(col("__graft_rn") === 1).drop("__graft_rn")
        }
      table.merge(reduced, mergeKeys, updateCols, extraSummary = stamp)
      true
    }
  }

  /**
   * Streaming exact dedup: drop re-arrivals of identical (normalized)
   * content — the streaming analogue of [[graft.ops.Dedup.exactDedup]] for
   * continuous corpus ingestion. State keeps ONE 32-char digest per unique
   * document seen inside the watermark horizon and is evicted as the
   * watermark passes, so state size is bounded by unique-arrival rate ×
   * watermark, never by stream length (the property that makes this safe
   * on an unbounded 100 TB/day feed). Duplicates arriving later than the
   * watermark are the documented trade-off — catch them with a periodic
   * batch `Dedup.exactDedup` compaction over the sink table.
   */
  /**
   * Streaming NEAR-duplicate filter — the continuous-ingestion form of
   * [[graft.ops.Dedup.simhashNearDups]]: each micro-batch is SimHash-
   * fingerprinted, checked against the ACCUMULATED corpus (the sink table
   * itself, which stores each survivor's fingerprint alongside the row)
   * via the guaranteed-recall pigeonhole band join, deduplicated within
   * the batch (lowest id survives a near-dup group), and only novel
   * documents append — fingerprint and document land in ONE atomic
   * batch-id-stamped snapshot commit, so the filter inherits the sink's
   * exactly-once replay guard.
   *
   * Scale shape per batch: one column-pruned scan of the corpus table's
   * (id, simhash) projection + an 8-byte-key band equi-join — cost
   * O(batch + collisions), never O(corpus²), and document text never
   * shuffles. State is the corpus itself, so there is no separate
   * state-store to bound: retention is the table's own lifecycle
   * (expire_snapshots / compaction).
   */
  def nearDupDedupStream(docs: DataFrame, textCol: String, idCol: String,
      table: graft.table.GraftTable, checkpointDir: String, maxDist: Int = 3,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val sid = streamId(checkpointDir)
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitNearDupBatch(table, batch, batchId, textCol, idCol, maxDist,
          runtimeStreamId(batch.sparkSession, sid)); ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** One near-dup-filtered micro-batch commit (replay-guarded like
    * [[commitMicroBatch]]); factored out so the filter semantics are
    * directly testable. Returns false when the batch is a recognized
    * replay. */
  private[streaming] def commitNearDupBatch(table: graft.table.GraftTable,
      batch: DataFrame, batchId: Long, textCol: String, idCol: String,
      maxDist: Int, streamId: String): Boolean = {
    import graft.ops.Dedup
    val lastCommitted = lastCommittedBatchId(table, streamId)
    if (lastCommitted.exists(_ >= batchId)) return false
    val fps = Dedup.simhash(batch, textCol, idCol)
    // within-batch: a doc near a LOWER-id batch doc is the duplicate.
    // Band the ALREADY-computed fingerprints — simhashNearDups would
    // re-tokenize and re-hash the whole batch text a second time
    val intraDups = Dedup.fingerprintNearDups(fps, idCol, "simhash", maxDist)
      .select(col("id_b").as(idCol))
    // vs corpus: band join against the stored fingerprint projection
    val seen = table.toDF.select(col(idCol), col("simhash"))
    val crossDups = Dedup.simhashNearDupAgainst(fps, seen, idCol, maxDist)
    val dupIds = intraDups.union(crossDups).distinct()
    val survivors = batch.join(fps, Seq(idCol))
      .join(dupIds, Seq(idCol), "left_anti")
    table.append(survivors, extraSummary = Map(
      BatchIdSummaryKey -> batchId.toString, StreamIdSummaryKey -> streamId))
    true
  }

  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__content_key", graft.ops.Dedup.contentKey(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")

  /**
   * Continuous gap-based sessionization: emits one SessionUpdate per closed
   * session (event-time gap > gapMs, enforced via processing of later
   * events per key; a production build would add an event-time timeout).
   */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) => {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
          sorted.foreach { e =>
            val ms = e.ts.getTime
            open match {
              case Some(s) if ms - s.lastMs <= gapMs =>
                open = Some(s.copy(lastMs = ms, nEvents = s.nEvents + 1,
                  totalValue = s.totalValue + e.value))
              case Some(s) =>
                closed += SessionUpdate(userId, s.sessionId, s.nEvents,
                  s.lastMs - s.startMs, s.totalValue, closed = true)
                open = Some(OpenSession(s.sessionId + 1, ms, ms, 1, e.value))
              case None =>
                open = Some(OpenSession(1, ms, ms, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.iterator
        })
  }

  /**
   * Watermarked stream-stream inner join: pair rows from two unbounded
   * streams whose event times are within `withinMs` of each other (right
   * time in [left time, left time + withinMs] — e.g. click after
   * impression). BOTH watermarks plus the time-bound predicate are what
   * make the state store finite: Spark buffers each side only until the
   * other side's watermark passes the join window, then evicts — without
   * the time bound the state would grow with stream length and this
   * method refuses nothing it should. Late rows beyond the watermark are
   * dropped by the engine (the standard trade; reconcile with a batch
   * join over the sink tables).
   *
   * Column names must be disjoint apart from the two key/time columns
   * named here; keys join null-unsafely like any SQL join.
   */
  def joinStreams(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      withinMs: Long, watermark: String = "1 hour"): DataFrame = {
    require(withinMs >= 0, s"withinMs must be non-negative, got $withinMs")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"joinStreams requires disjoint column names; shared: ${overlap.mkString(", ")} " +
        "(rename one side — shared names make the join condition ambiguous " +
        "and duplicate output columns)")
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTime) >= l(leftTime) &&
        r(rightTime) <= l(leftTime) + expr(s"INTERVAL $withinMs MILLISECONDS"))
  }

  /**
   * Stream-static enrichment join: attach dimension attributes to each
   * streaming event. The static side is re-planned per micro-batch (Spark's
   * stream-static join semantics — a dimension refresh is picked up on the
   * next batch), the join is STATELESS (no watermark, no state store: only
   * stream-stream joins buffer), and a broadcast-eligible dimension
   * broadcasts per batch so the stream side never shuffles. Left join keeps
   * events with no dimension row (null attributes) — dropping them silently
   * would turn an enrichment into a filter.
   *
   * @param dimCols dimension attribute columns to carry (key excluded)
   */
  def enrich(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String, dimCols: Seq[String]): DataFrame = {
    val attrOverlap = dimCols.toSet.intersect(stream.columns.toSet)
    require(attrOverlap.isEmpty,
      s"dimension attribute columns collide with stream columns: " +
        s"${attrOverlap.mkString(", ")} (rename or exclude them)")
    val dimSel = dim.select((dimKey +: dimCols).distinct.map(col): _*)
    // dataframe-qualified references: a stream key sharing the dimension
    // key's name must not make the condition ambiguous, and the drop must
    // remove only the dimension's copy
    stream.join(dimSel, stream(streamKey) === dimSel(dimKey), "left")
      .drop(dimSel(dimKey))
  }

  /**
   * Replay one changelog micro-batch (a `graft-stream` read with
   * `.option("changelog", true)`) into a graft sink table — the Iceberg
   * CDC-consume shape: snapshots apply IN COMMIT ORDER, each as
   * retractions first, then inserts (merge-on-read sequence semantics:
   * a snapshot's deletes never touch its own inserts).
   *
   *  - `DELETE_KEY` images (equality-delete commits) retract by their
   *    key tuple — the `_change_key` metadata column carries the delete
   *    file's actual key-column list under the CURRENT declared names
   *    (keys recorded before a later rename map forward), so an all-null
   *    recorded key column still participates (batches without
   *    `_change_key` fall back to inferring keys from non-null columns,
   *    with that caveat);
   *  - `DELETE` images (deletion-vector AND copy-on-write commits) are
   *    full rows and retract by whole-row equality (exact when rows are
   *    unique — a DV names ONE physical row, whole-row replay removes
   *    all duplicates; deduplicate upstream or key the table if that
   *    matters); a CoW commit's carryover DELETE+INSERT pairs net out
   *    because its deletes apply before its inserts;
   *  - `INSERT` images append.
   *
   * All retractions match NULL-SAFELY (`<=>`, the equality-delete
   * contract of the batch read path): a deleted row carrying nulls — in a
   * key column or anywhere in a DV full-row image — is still removed from
   * the sink.
   *
   * Used from `foreachBatch` with the stream checkpoint providing
   * at-least-once delivery; a RETRIED micro-batch re-applies (the
   * retractions are idempotent, the inserts are not) — wrap with the
   * batch-id replay guard of [[writeToGraftTable]] when the sink needs
   * exactly-once under mid-batch crashes.
   */
  def replayChangelog(batch: DataFrame,
      sink: graft.table.GraftTable): Unit = {
    val hasKeyCol = batch.columns.contains("_change_key")
    val cols = batch.columns.toSeq.filterNot(c =>
      c == "_change_type" || c == "_commit_snapshot_id" || c == "_change_key")
    val snaps = batch.select(col("_commit_snapshot_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    snaps.foreach { sid =>
      val b = batch.filter(col("_commit_snapshot_id") === sid).cache()
      try {
        val delKeys = b.filter(col("_change_type") === "DELETE_KEY")
        if (!delKeys.isEmpty) {
          // one delete commit can carry several delete files with
          // DIFFERENT key sets: retract each recorded key list separately
          val keyLists: Seq[Seq[String]] =
            if (hasKeyCol)
              delKeys.select(col("_change_key")).distinct().collect()
                .map(_.getString(0)).toSeq.sorted
                .map(_.split(",").toSeq)
            else {
              // `_change_key` was projected away — infer the key set from
              // the null pattern, in ONE aggregation (not one job per
              // column). A key column must be non-null in EVERY recorded
              // tuple; a PARTIALLY-populated column is ambiguous (either a
              // null key value or a second, narrower key set mixed into
              // the batch) and retracting on a guess would silently
              // under- or over-delete, so it is refused instead.
              val counts = delKeys.agg(count(lit(1)).as("__n"),
                cols.map(c => count(col(c)).as(c)): _*).head
              val total = counts.getLong(0)
              val full = cols.filter(c =>
                counts.getLong(counts.fieldIndex(c)) == total)
              val partial = cols.filter { c =>
                val n = counts.getLong(counts.fieldIndex(c))
                n > 0 && n < total
              }
              require(partial.isEmpty,
                s"replayChangelog: cannot infer delete keys — column(s) " +
                  s"${partial.mkString(", ")} are non-null in only part of " +
                  "the recorded tuples (a null key value or mixed key " +
                  "sets). Keep the _change_key column in the changelog " +
                  "frame instead of projecting it away.")
              require(full.nonEmpty,
                "replayChangelog: no non-null key columns to retract on")
              Seq(full)
            }
          keyLists.foreach { keys =>
            val group =
              if (hasKeyCol)
                delKeys.filter(col("_change_key") === keys.mkString(","))
              else delKeys
            sink.merge(group.select(cols.map(col): _*).distinct(),
              keys, insertNotMatched = false, deleteMatched = true,
              nullSafeKeys = true)
          }
        }
        val delRows = b.filter(col("_change_type") === "DELETE")
        if (!delRows.isEmpty)
          sink.merge(delRows.select(cols.map(col): _*).distinct(),
            cols, insertNotMatched = false, deleteMatched = true,
            nullSafeKeys = true)
        val ins = b.filter(col("_change_type") === "INSERT")
        if (!ins.isEmpty) sink.append(ins.select(cols.map(col): _*))
      } finally b.unpersist()
    }
  }
}
