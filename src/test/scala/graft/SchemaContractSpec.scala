package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.{EventsReader, TableFixtures}

/**
 * The contract between the driver-generated testdata and this engine's
 * loaders. The driver has regenerated the testdata between rounds with
 * changed physical dtypes (events.ts went parquet TIMESTAMP(NANOS) →
 * timestamp[us], silently erroring every downstream events query at
 * analysis time); this spec pins the whole surface so the NEXT
 * regeneration fails one clear test naming the table and column instead
 * of a dozen queries.
 */
class SchemaContractSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The loader each query path actually uses for `t`. */
  /** getMessage can be null (NPE) or empty (NoSuchElementException on
    * linesIterator.next) — either would bury the real load failure under a
    * confusing secondary exception in exactly the scenario this spec
    * exists to diagnose. */
  private def firstLine(e: Throwable): String =
    String.valueOf(e.getMessage).linesIterator.nextOption.getOrElse(e.toString)

  private def load(t: String) =
    if (t == "events") EventsReader.read(spark, sf)
    else TableFixtures.read(spark, sf, t)

  test("every testdata table loads AND every column materializes") {
    for (t <- tables) {
      val df =
        try load(t)
        catch { case e: Throwable =>
          fail(s"testdata contract: table '$t' no longer loads — ${firstLine(e)}")
        }
      // force a full-width decode of a few rows: dtype drift that passes
      // analysis can still explode in the vectorized reader
      try df.limit(5).collect()
      catch { case e: Throwable =>
        fail(s"testdata contract: table '$t' fails to decode — ${firstLine(e)}")
      }
    }
  }

  test("timestamp-bearing columns land as a timestamp type the queries accept") {
    // events goes through the adaptive reader → session-zoned timestamp
    assert(load("events").schema("ts").dataType === TimestampType)
    // orders/lineitem date-arithmetic queries (datediff, date literals)
    // accept DATE or any timestamp flavor — pin that it stays in that set
    for ((t, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val dt = load(t).schema(c).dataType
      assert(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
        s"$t.$c is $dt — date arithmetic in the q* queries would break")
    }
  }

  test("key column dtypes the engine's joins/aggs assume") {
    val expect = Map(
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_returnflag" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType),
      "customer" -> Map("c_custkey" -> LongType),
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true)))
    for ((t, cols) <- expect; (c, want) <- cols) {
      val got = load(t).schema(c).dataType
      assert(got === want, s"testdata contract: $t.$c is $got, engine assumes $want")
    }
  }

  test("EventsReader normalizes BOTH ts vintages to identical instants") {
    import spark.implicits._
    // micros vintage: TIMESTAMP_NTZ column (what timestamp[us] parquet
    // reads as under inferTimestampNTZ)
    val micros = Seq(1704067200123456L, 1704070800654321L)
    val ntz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    // nanos vintage: LongType epoch-nanos (what nanosAsLong surfaces)
    val nanos = micros.map(_ * 1000L).toDF("ts")
    val a = EventsReader.normalizeTs(ntz).select(unix_micros(col("ts")))
      .as[Long].collect().toSeq
    val b = EventsReader.normalizeTs(nanos).select(unix_micros(col("ts")))
      .as[Long].collect().toSeq
    assert(a === micros)
    assert(b === micros)
    // already-normalized frames pass through untouched
    val t = EventsReader.normalizeTs(ntz.select(col("ts").cast(TimestampType)))
    assert(t.schema("ts").dataType === TimestampType)
    // an unknown vintage fails loudly, not at some downstream analysis site
    intercept[IllegalArgumentException] {
      EventsReader.normalizeTs(Seq("x").toDF("ts"))
    }
  }
}
