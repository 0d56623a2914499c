package graft.tools

import java.io.OutputStream

import graft.parse.{FixedWidthParser, Strict}
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: separate the OCF write leg's CPU cost from disk I/O.
  *
  *  - `dfw-null-sink`: current DataFileWriter path into a discarding
  *    OutputStream — pure CPU (datum write + snappy).
  *  - `preenc-null-sink`: rows pre-encoded by the codegen'd to_avro,
  *    writer task only concatenates bytes into blocks + snappy —
  *    the candidate fast path's CPU cost.
  *  - `dfw-disk` / `preenc-disk`: same, to /tmp (page-cache writes).
  */
object ProbeOcfCpu {
  private final class NullOut extends OutputStream {
    var n = 0L
    override def write(b: Int): Unit = n += 1
    override def write(b: Array[Byte], off: Int, len: Int): Unit = n += len
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-ocf-cpu")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1-weblog"
    val schema = graft.Bench.weblogFixed
    val parsed = FixedWidthParser.parse(spark.read.text(dir), schema, Strict)
    val avroJson = schema.avroJson
    val sparkSchema = parsed.schema

    def t(f: => Unit): String = {
      System.gc(); Thread.sleep(200)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; f"${(System.nanoTime() - t0) / 1e9}%.3f"
      }.mkString(" ")
    }

    // (a) current path, null sink
    def dfwNull(): Unit = parsed.queryExecution.toRdd.foreachPartition { rows =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter(graft.sources.Ocf.datumWriter(avroSchema, sparkSchema))
      w.setCodec(CodecFactory.snappyCodec())
      w.setSyncInterval(1 << 20)
      w.create(avroSchema, new NullOut)
      try rows.foreach(w.append) finally w.close()
    }

    // (b) pre-encoded bytes (codegen to_avro), manual blocks, null sink
    val enc = parsed.select(graft.functions.AvroCodec.to_avro(
      struct(schema.fields.map(f => col(f.name)): _*), avroJson).as("v"))
    def preencNull(): Unit = enc.queryExecution.toRdd.foreachPartition { rows =>
      val raw = new Array[Byte](1 << 20)
      val comp = new Array[Byte](org.xerial.snappy.Snappy.maxCompressedLength(1 << 20))
      val out = new NullOut
      var pos = 0
      while (rows.hasNext) {
        val b = rows.next().getBinary(0)
        if (pos + b.length > raw.length) {
          val n = org.xerial.snappy.Snappy.compress(raw, 0, pos, comp, 0)
          out.write(comp, 0, n); pos = 0
        }
        System.arraycopy(b, 0, raw, pos, b.length); pos += b.length
      }
      if (pos > 0) { val n = org.xerial.snappy.Snappy.compress(raw, 0, pos, comp, 0); out.write(comp, 0, n) }
    }

    parsed.write.format("noop").mode("overwrite").save() // warm
    println("PROBE parse-noop:      " + t(parsed.write.format("noop").mode("overwrite").save()))
    dfwNull()
    println("PROBE dfw-null-sink:   " + t(dfwNull()))
    println("PROBE preenc-null:     " + t(preencNull()))
    println("PROBE encode-noop:     " + t(enc.write.format("noop").mode("overwrite").save()))
    println("PROBE dfw-disk:        " + t(graft.sources.Ocf.write(parsed, schema, "/tmp/probe-ocfcpu")))
    spark.stop()
  }
}
