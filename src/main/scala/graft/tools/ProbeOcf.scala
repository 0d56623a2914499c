package graft.tools

import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame

/** Dev probe: OCF write leg breakdown over the cached weblog corpus —
  * parse alone, snappy vs null codec, and sync-interval variants. */
object ProbeOcf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-ocf")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1-weblog"
    val lines = spark.read.text(dir)
    val schema = graft.Bench.weblogFixed
    val parsed = FixedWidthParser.parse(lines, schema, Strict)
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def med(f: => Unit): String = {
      System.gc(); Thread.sleep(200)
      (1 to 3).map(_ => f"${t(f)}%.3f").mkString(" ")
    }
    force(parsed)
    println("PROBE parse-noop:   " + med(force(parsed)))
    graft.sources.Ocf.write(parsed, schema, "/tmp/probe-ocf-warm")
    println("PROBE ocf-snappy:   " + med(
      graft.sources.Ocf.write(parsed, schema, "/tmp/probe-ocf-s")))
    println("PROBE ocf-null:     " + med(
      Ocf2.write(parsed, schema, "/tmp/probe-ocf-n", codec = "null", sync = 1 << 20)))
    println("PROBE ocf-snap-64k: " + med(
      Ocf2.write(parsed, schema, "/tmp/probe-ocf-64", codec = "snappy", sync = 1 << 16)))
    val du = new java.io.File("/tmp/probe-ocf-s").listFiles.map(_.length).sum / 1e6
    val dn = new java.io.File("/tmp/probe-ocf-n").listFiles.map(_.length).sum / 1e6
    println(f"PROBE sizes: snappy $du%.0f MB, null $dn%.0f MB")
    spark.stop()
  }
}

/** Ocf.write with codec/sync knobs (probe-only copy). */
object Ocf2 {
  import org.apache.avro.Schema
  import org.apache.avro.file.{CodecFactory, DataFileWriter}
  import org.apache.hadoop.fs.Path
  def write(df: DataFrame, schema: graft.schema.FixedSchema, dir: String,
      codec: String, sync: Int): Unit = {
    val avroJson = schema.avroJson
    val sparkSchema = df.schema
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.queryExecution.toRdd.foreachPartition {
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val avroSchema = new Schema.Parser().parse(avroJson)
      val path = new Path(dir, f"part-$pid%05d.avro")
      val fs = path.getFileSystem(hadoopConf.value)
      val out = fs.create(path, true)
      val w = new DataFileWriter(graft.sources.Ocf.datumWriter(avroSchema, sparkSchema))
      w.setCodec(if (codec == "null") CodecFactory.nullCodec() else CodecFactory.snappyCodec())
      w.setSyncInterval(sync)
      w.create(avroSchema, out)
      try rows.foreach(w.append)
      finally w.close()
    }
  }
}
