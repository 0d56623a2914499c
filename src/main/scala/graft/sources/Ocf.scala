package graft.sources

import java.io.ByteArrayInputStream

import graft.schema.FixedSchema
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File sink + source (snappy), one file per
  * partition — the Spark re-expression of the reference's
  * `AvroFileExporter` which writes one snappy OCF per chunk named
  * `<dir><chunkNr>` (`fixed2avro/Exporters.go:105-138`). spark-avro is
  * not in this environment, so both paths are built on the Avro Java
  * library directly; partitions replace chunks 1:1.
  *
  * Scale note: writers stream record-by-record through the Hadoop
  * filesystem API (no whole-partition buffering), and the reader
  * parallelizes per file — with file-per-partition output the read
  * parallelism equals the write parallelism.
  */
object Ocf {

  /** Internal (Tungsten) value → Avro value, per field. Reads the
    * primitive straight out of the `InternalRow` — timestamps and dates
    * are ALREADY epoch micros / days internally, so the external-Row
    * path's per-value `LocalDateTime`/`java.sql.Timestamp` round-trip
    * (the dominant cost of the old writer) disappears, and strings wrap
    * the UTF-8 bytes without a char decode. */
  private def internalToAvro(dt: DataType, avro: Schema): (org.apache.spark.sql.catalyst.InternalRow, Int) => AnyRef = {
    val logical = Option(avro.getProp("logicalType"))
    dt match {
      case StringType  => (r, i) => new org.apache.avro.util.Utf8(r.getUTF8String(i).getBytes)
      case BinaryType  => (r, i) => java.nio.ByteBuffer.wrap(r.getBinary(i))
      case BooleanType => (r, i) => java.lang.Boolean.valueOf(r.getBoolean(i))
      case IntegerType if avro.getType == Schema.Type.LONG =>
        (r, i) => java.lang.Long.valueOf(r.getInt(i).toLong)
      case IntegerType => (r, i) => java.lang.Integer.valueOf(r.getInt(i))
      case LongType    => (r, i) => java.lang.Long.valueOf(r.getLong(i))
      case FloatType   => (r, i) => java.lang.Float.valueOf(r.getFloat(i))
      case DoubleType  => (r, i) => java.lang.Double.valueOf(r.getDouble(i))
      case DateType    => (r, i) => java.lang.Integer.valueOf(r.getInt(i))
      case TimestampType | TimestampNTZType =>
        if (logical.contains("timestamp-millis"))
          (r, i) => java.lang.Long.valueOf(Math.floorDiv(r.getLong(i), 1000L))
        else (r, i) => java.lang.Long.valueOf(r.getLong(i))
      case t => throw new IllegalArgumentException(s"Ocf: unsupported Spark type $t")
    }
  }

  /** Avro value → external (Row-API) value, per field. */
  private def avroToRow(avro: Schema, dt: DataType): AnyRef => Any = {
    val logical = Option(avro.getProp("logicalType"))
    dt match {
      case StringType  => v => v.toString
      case BinaryType  => v => {
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      }
      case BooleanType => v => v
      case IntegerType => v => v match {
        case l: java.lang.Long => java.lang.Integer.valueOf(l.intValue()); case x => x
      }
      case LongType   => v => v
      case FloatType  => v => v
      case DoubleType => v => v
      case DateType   => v => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue()))
      case TimestampType =>
        val fromMicros: Long => java.sql.Timestamp = micros => {
          val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        }
        if (logical.contains("timestamp-millis"))
          v => fromMicros(Math.multiplyExact(v.asInstanceOf[java.lang.Long].longValue(), 1000L))
        else v => fromMicros(v.asInstanceOf[java.lang.Long].longValue())
      case TimestampNTZType =>
        val fromMicros: Long => java.time.LocalDateTime = micros =>
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        if (logical.contains("timestamp-millis"))
          v => fromMicros(Math.multiplyExact(v.asInstanceOf[java.lang.Long].longValue(), 1000L))
        else v => fromMicros(v.asInstanceOf[java.lang.Long].longValue())
      case t => throw new IllegalArgumentException(s"Ocf: unsupported Spark type $t")
    }
  }

  /** Write `df` as snappy OCF, one file per partition named
    * `<dir>/part-<partitionId>.avro` (≡ `<dir><chunkNr>`,
    * `fixed2avro/Exporters.go:112-123`). */
  def write(df: DataFrame, schema: FixedSchema, dir: String): Unit = {
    val avroJson = schema.avroJson
    val sparkSchema = df.schema
    // Session Hadoop conf, serializably captured: keeps fs.defaultFS /
    // object-store credentials working on executors (a bare
    // `new Configuration()` only sees local defaults).
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // queryExecution.toRdd stays on InternalRow — no Tungsten exit, no
    // external-Row boxing per value. Values are copied into the Avro
    // encoder at append time, so the per-iterator row buffer reuse is
    // safe.
    df.queryExecution.toRdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val avroSchema = new Schema.Parser().parse(avroJson)
      val conv = sparkSchema.fields.zipWithIndex.map { case (f, i) =>
        internalToAvro(f.dataType, avroSchema.getFields.get(i).schema())
      }
      val path = new Path(dir, f"part-$pid%05d.avro")
      val fs = path.getFileSystem(hadoopConf.value)
      val out = fs.create(path, true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      w.setCodec(CodecFactory.snappyCodec())
      w.create(avroSchema, out)
      try {
        val rec = new GenericData.Record(avroSchema)
        rows.foreach { row =>
          var i = 0
          while (i < conv.length) {
            rec.put(i, if (row.isNullAt(i)) null else conv(i)(row, i))
            i += 1
          }
          w.append(rec)
        }
      } finally w.close()
    }
  }

  /** Read a directory of OCF files into a DataFrame with the strict
    * schema of `schema`. Decoding uses each file's embedded writer
    * schema (implicit evolution, like the consumer read path —
    * `kafkaavro/consumer.go:178-189`). */
  def read(spark: SparkSession, dir: String, schema: FixedSchema): DataFrame = {
    val sparkSchema = schema.sparkSchema
    val readerJson = schema.avroJson
    val rdd = spark.sparkContext
      .binaryFiles(dir + "/*.avro")
      .flatMap { case (_, pds) =>
        val readerSchema = new Schema.Parser().parse(readerJson)
        val reader = new GenericDatumReader[GenericRecord](null, readerSchema)
        val stream = new DataFileStream(pds.open(), reader)
        // Close unconditionally at task end: a limit/take or task failure
        // leaves the iterator partially consumed, which would otherwise
        // leak the file handle and snappy decompressor.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => stream.close()))
        val conv = sparkSchema.fields.zipWithIndex.map { case (f, i) =>
          avroToRow(readerSchema.getFields.get(i).schema(), f.dataType)
        }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = stream.hasNext; if (!h) stream.close(); h }
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(conv.indices.map { i =>
              val v = rec.get(i); if (v == null) null else conv(i)(v)
            })
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** In-memory OCF decode used by tests: bytes of one container file →
    * records as (schema, rows of Avro values). */
  def decodeBytes(bytes: Array[Byte]): (Schema, Seq[GenericRecord]) = {
    val stream = new DataFileStream(new ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (stream.hasNext) buf += stream.next()
      (stream.getSchema, buf.toSeq)
    } finally stream.close()
  }
}
