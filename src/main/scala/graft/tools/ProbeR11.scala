package graft.tools

import graft.functions.AvroCodec
import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (round 11): prices the three legs under optimization —
  * multibyte twin parse (slicer slow path), weblog parse, and the fused
  * parse+encode — on the cached sf0.1 bench corpora. Not engine
  * surface; lives under tools/ only. */
object ProbeR11 {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def runs(label: String, n: Int)(f: => Unit): Unit = {
    System.gc(); Thread.sleep(200)
    val xs = Seq.fill(n) { System.gc(); Thread.sleep(100); t(f) }
    println(f"[probe] $label: min=${xs.min}%.3f med=${xs.sorted.apply(n / 2)}%.3f " +
      xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    val schema = graft.Bench.weblogFixed
    val legs = if (args.isEmpty) Set("mb", "weblog", "encode") else args.toSet

    def sliceOnly(lines: DataFrame): DataFrame = {
      val trims = schema.fields.map(_ => false).toArray
      val sliced = graft.functions.FixedSlice.fixed_slices(col("value"), schema, trims)
      lines.select(schema.fields.zipWithIndex.map { case (f, i) =>
        element_at(sliced, i + 1).as(f.name) }: _*)
    }
    if (legs("mb")) {
      val mbLines = graft.sources.FixedWidth.lines(spark, "/tmp/graft-bench-corpus/_root_testdata_sf0.1-weblogmb-4g")
      val mb = FixedWidthParser.parse(mbLines, schema, Strict)
      force(mb)
      runs("mb_parse", 5)(force(mb))
      runs("mb_scan", 3)(force(mbLines))
      val mbSlice = sliceOnly(mbLines)
      force(mbSlice)
      runs("mb_slice_only", 5)(force(mbSlice))
    }
    if (legs("weblog") || legs("encode") || legs("ocf") || legs("ram")) {
      val lines = graft.sources.FixedWidth.lines(spark, "/tmp/graft-bench-corpus/_root_testdata_sf0.1-weblog-4g")
      val parsed = FixedWidthParser.parse(lines, schema, Strict)
      force(parsed)
      if (legs("weblog")) {
        runs("weblog_scan", 3)(force(lines))
        runs("weblog_parse", 5)(force(parsed))
        val wSlice = sliceOnly(lines)
        force(wSlice)
        runs("weblog_slice_only", 5)(force(wSlice))
      }
      if (legs("encode")) {
        val chain = parsed.select(AvroCodec.to_avro_confluent(
          schema.fields.map(f => col(f.name)), schema.avroJson, 42).as("value"))
        force(chain)
        runs("weblog_encode_chain", 5)(force(chain))
        val fused = FixedWidthParser.toAvro(lines, schema, 42)
        force(fused)
        runs("weblog_encode_fused", 5)(force(fused))
      }
      if (legs("ocf")) {
        graft.sources.Ocf.writeCpu(parsed, schema)
        runs("ocf_cpu_typed", 5)(graft.sources.Ocf.writeCpu(parsed, schema))
        graft.sources.Ocf.writeCpuFixed(lines, schema)
        runs("ocf_cpu_fused", 5)(graft.sources.Ocf.writeCpuFixed(lines, schema))
      }
      if (legs("ram")) {
        // fresh subdir per run; deletion happens untimed afterwards
        var i = 0
        def del(n: Int): Unit = (0 to n).foreach { k =>
          val d = new java.io.File(s"/dev/shm/graft-probe-ocf-$k")
          Option(d.listFiles).foreach(_.foreach(_.delete())); d.delete(); ()
        }
        graft.sources.Ocf.writeFixed(lines, schema, "/dev/shm/graft-probe-ocf-0")
        del(0)
        runs("ocf_ram_fused", 5) {
          graft.sources.Ocf.writeFixed(lines, schema, s"/dev/shm/graft-probe-ocf-$i")
          i += 1
        }
        del(i)
      }
    }
    spark.stop()
  }
}
