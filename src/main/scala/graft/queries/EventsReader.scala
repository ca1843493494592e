package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/**
 * The single adaptive reader for the driver's `events` testdata.
 *
 * The driver has shipped `events.ts` in two vintages:
 *   - parquet TIMESTAMP(NANOS): Spark 4 rejects it outright unless
 *     `spark.sql.legacy.parquet.nanosAsLong` makes it surface as
 *     `LongType` epoch-nanos, which then needs an explicit
 *     nanos → micros conversion;
 *   - parquet `timestamp[us]` (isAdjustedToUTC=false): Spark reads it
 *     natively as `TIMESTAMP_NTZ`, and the only normalization needed is a
 *     cast to the session-zoned `TimestampType` (the session time zone is
 *     pinned to UTC everywhere in this project, so the cast is
 *     epoch-preserving).
 *
 * Every consumer — the batch `events` loader behind all `e_*` analytics,
 * the streaming fixtures, and the plan-quality specs — must route through
 * [[normalizeTs]] so a future re-generation of the testdata changes ONE
 * branch here instead of erroring a dozen queries at analysis time
 * (round-8 post-mortem). `SchemaContractSpec` pins that every testdata
 * column dtype is accepted.
 */
object EventsReader {

  /** True when `dt` is a `ts` dtype this reader knows how to normalize. */
  def accepts(dt: DataType): Boolean = dt match {
    case LongType | TimestampNTZType | TimestampType => true
    case _ => false
  }

  /** Normalize an events frame's `ts` column to session-zoned
    * `TimestampType` at microsecond precision, whatever vintage the frame
    * was read as. Works on batch and streaming frames alike (pure column
    * ops). */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => // nanos-as-long vintage: truncate to micros
        df.withColumn(tsCol,
          timestamp_micros(expr(s"CAST($tsCol DIV 1000 AS LONG)")))
      case TimestampNTZType => // micros vintage: epoch-preserving under UTC
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.$tsCol has unsupported dtype $other — extend EventsReader")
    }

  /** A session-zoned timestamp truncated to whole milliseconds (the
    * stream-stream join fixture aligns both sides to epoch-ms bounds). */
  def truncToMillis(ts: Column): Column =
    timestamp_micros((unix_micros(ts) - pmod(unix_micros(ts), lit(1000L)))
      .cast("long"))

  /** Batch read of `$dir/events.parquet`, `ts` normalized. The legacy
    * nanos conf is set unconditionally: it is a no-op for the micros
    * vintage and the only way the nanos vintage is readable at all. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }
}
