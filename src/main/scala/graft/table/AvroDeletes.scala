package graft.table

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro physical format for merge-on-read DELETE FILES — the reference's
 * `write.delete.format.default = avro` (IcebergLoadActivityTask.scala:34)
 * honored for real: Iceberg writes row-level delete files as Avro by
 * default, and this module does the same with the raw Avro container
 * API (`avro-1.12` is on every Spark classpath; the spark-avro
 * DataSource is not needed — delete files have tiny flat schemas).
 *
 * Write shape: the delete frame's partitions each stream one Avro
 * container file into the staging dir (`foreachPartition` — executor-
 * side, no driver materialization, deflate-compressed). Read shape: one
 * task per delete file decoding `GenericRecord`s back to rows
 * (`mapPartitions` over the file list). Delete files are the SMALL side
 * of the MoR trade by design, so per-file tasks are the right
 * granularity.
 *
 * Type coverage matches what delete files can carry: the atomic Spark
 * types, with timestamps as Avro `timestamp-micros` and dates as
 * `date` logical types — same physical encodings Iceberg uses.
 * Unsupported key types fail loudly at write time (unset the property
 * to fall back to parquet delete files).
 */
object AvroDeletes {

  val Extension = ".avro"

  private def avroFieldType(dt: DataType): Schema = {
    val base = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType | TimestampNTZType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case other => throw new UnsupportedOperationException(
        s"avro delete files do not support key type $other " +
          "(unset write.delete.format.default to use parquet delete files)")
    }
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
  }

  def avroSchemaFor(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name, avroFieldType(f.dataType),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_delete", null, "graft", false,
      fields.toList.asJava)
  }

  private def toAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case s: String => s
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000
    case l: java.time.LocalDateTime =>
      val inst = l.toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => other // long, int, double, float, boolean
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, _) => u.toString
    case (s: String, _) => s
    case (l: java.lang.Long, TimestampType | TimestampNTZType) =>
      // floor semantics so pre-1970 micros land on the right millisecond
      val ts = new java.sql.Timestamp(java.lang.Math.floorDiv(l, 1000L))
      ts.setNanos(java.lang.Math.floorMod(l, 1000000L).toInt * 1000)
      ts
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (i: java.lang.Integer, ShortType) => i.shortValue()
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (other, _) => other
  }

  /** Write `df` as Avro container files under `stagingDir` (one per
    * non-empty partition); returns nothing — callers list the dir. */
  def write(df: DataFrame, stagingDir: Path, conf: Configuration): Unit = {
    val schema = df.schema
    val avroJson = avroSchemaFor(schema).toString
    val dir = stagingDir.toString
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val avroSchema = new Schema.Parser().parse(avroJson)
        // poor-man's task commit: write under a tmp name invisible to the
        // staging listing (no $Extension suffix), rename only on task
        // SUCCESS — a failed/retried task's torn container can never be
        // listed as a delete file (a torn Avro file reads as silently
        // truncated delete keys, a correctness hole, not just waste)
        val id = java.util.UUID.randomUUID().toString.take(12)
        val tmp = new Path(dir, s".inflight-$id")
        val fin = new Path(dir, s"part-$id$Extension")
        val fs = tmp.getFileSystem(serConf.value)
        val out = fs.create(tmp, false)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(avroSchema, out)
        var ok = false
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < schema.length) {
              rec.put(schema(i).name, toAvro(row.get(i), schema(i).dataType))
              i += 1
            }
            writer.append(rec)
          }
          ok = true
        } finally {
          writer.close() // closes the stream
          if (ok && !fs.rename(tmp, fin))
            throw new java.io.IOException(s"could not publish $fin")
          if (!ok) fs.delete(tmp, false)
        }
      }
    }
  }

  /** Record count of one Avro container file (block headers only — no
    * record decode). */
  def countRecords(path: Path, conf: Configuration): Long = {
    val in = path.getFileSystem(conf).open(path)
    val stream = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      var n = 0L
      while (stream.hasNext) {
        val inBlock = stream.getBlockCount
        if (inBlock > 0) { n += inBlock; stream.nextBlock() }
        else { stream.next(); n += 1 }
      }
      n
    } finally stream.close()
  }

  /** Invert [[avroFieldType]]: the Spark type a stored field decodes to
    * (the file header is the source of truth, exactly like the parquet
    * path's file-defined schema — era-correct by construction). */
  private def sparkTypeOf(s: Schema): DataType = {
    val base = s.getType match {
      case Schema.Type.UNION =>
        return sparkTypeOf(s.getTypes.asScala
          .find(_.getType != Schema.Type.NULL).get)
      case Schema.Type.STRING => StringType
      case Schema.Type.LONG =>
        if (s.getLogicalType != null &&
            s.getLogicalType.getName == "timestamp-micros") TimestampType
        else LongType
      case Schema.Type.INT =>
        if (s.getLogicalType != null && s.getLogicalType.getName == "date")
          DateType
        else IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      case other => throw new UnsupportedOperationException(
        s"unexpected avro type $other in a graft delete file")
    }
    base
  }

  /** Avro record value → CATALYST value (UTF8String / micros-long /
    * epoch-days-int …) for the streaming changelog reader, which builds
    * InternalRows directly. Timestamp micros and date days pass through
    * unconverted — they ARE Catalyst's physical encodings. */
  private def fromAvroCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, _) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(u.toString)
    case (s: String, _) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (i: java.lang.Integer, ShortType) => i.shortValue()
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (other, _) => other // long, int, double, float, boolean,
                             // timestamp-micros long, date-days int
  }

  /** Executor-side streamed read of ONE Avro delete container as Catalyst
    * value arrays in `keyCols` order — the changelog stream's DELETE_KEY
    * source (no DataFrame machinery on the hot path; a delete file can
    * carry millions of keys and streams without buffering). */
  def catalystIterator(path: String, conf: Configuration,
      keyCols: Seq[String], keyTypes: Seq[DataType]): Iterator[Array[Any]] = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    val stream = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    val names = keyCols.toArray
    val types = keyTypes.toArray
    new Iterator[Array[Any]] with AutoCloseable {
      private var closed = false
      override def hasNext: Boolean = {
        if (closed) return false
        val h = stream.hasNext
        if (!h) close()
        h
      }
      override def next(): Array[Any] = {
        val rec = stream.next()
        val out = new Array[Any](names.length)
        var i = 0
        while (i < names.length) {
          out(i) = fromAvroCatalyst(rec.get(names(i)), types(i))
          i += 1
        }
        out
      }
      override def close(): Unit =
        if (!closed) { stream.close(); closed = true }
    }
  }

  /** Self-describing read: the schema comes from the FIRST file's Avro
    * header (all files of one delete commit share it). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "avro delete read: no files")
    val conf = spark.sparkContext.hadoopConfiguration
    val head = new Path(paths.head)
    val in = head.getFileSystem(conf).open(head)
    val stream = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    val avroSchema = try stream.getSchema finally stream.close()
    val sparkSchema = StructType(avroSchema.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), sparkTypeOf(f.schema()), nullable = true)))
    read(spark, paths, sparkSchema)
  }

  /** Read one-or-more Avro delete files as a DataFrame with `schema` —
    * one task per file (delete files are the small MoR side). */
  def read(spark: SparkSession, paths: Seq[String],
      schema: StructType): DataFrame =
    readImpl(spark, paths, schema, tagSource = false)

  /** [[read]] plus a `__source` column carrying each row's origin path
    * (verbatim as passed) — lets a multi-file metadata read keep
    * per-delete-file provenance in ONE distributed scan instead of one
    * plan branch per file. Separate from [[read]] so the MoR read hot
    * path never builds (and the row encoder never converts) a per-row
    * path string it would only drop. */
  def readTagged(spark: SparkSession, paths: Seq[String],
      schema: StructType): DataFrame =
    readImpl(spark, paths, schema, tagSource = true)

  private def readImpl(spark: SparkSession, paths: Seq[String],
      schema: StructType, tagSource: Boolean): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fieldTypes = schema.fields.map(_.dataType)
    val fieldNames = schema.fields.map(_.name)
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap { p =>
        val path = new Path(p)
        val fs = path.getFileSystem(conf.value)
        val in = fs.open(path)
        val stream = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        // streamed, closing on exhaustion — a delete file can carry
        // millions of keys and must not buffer in one task
        new Iterator[Row] {
          private var closed = false
          override def hasNext: Boolean = {
            if (closed) return false
            val h = stream.hasNext
            if (!h) { stream.close(); closed = true }
            h
          }
          override def next(): Row = {
            val rec = stream.next()
            val vals = fieldNames.zip(fieldTypes).map {
              case (n, dt) => fromAvro(rec.get(n), dt)
            }.toSeq
            Row.fromSeq(if (tagSource) vals :+ p else vals)
          }
        }
      }
    spark.createDataFrame(rdd,
      if (tagSource) StructType(schema.fields :+ StructField("__source", StringType))
      else schema)
  }
}
