package graft.tools

import graft.ops.Pipeline
import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.functions._

// Parse-leg profiling over the bench corpus: repeat timings, partition
// counts, per-column cost attribution.
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val lines = spark.read.text(dir)
    println(s"PROBE partitions=${lines.rdd.getNumPartitions}")
    time("scan1") { force(lines) }
    val parsed = FixedWidthParser.parse(lines, Pipeline.lineitemFixed, Strict)
    time("parse1") { force(parsed) }
    time("parse2") { force(parsed) }
    // without the timestamp column
    val noTs = Pipeline.lineitemFixed.copy(fields = Pipeline.lineitemFixed.fields.init)
    time("parse-no-ts") { force(FixedWidthParser.parse(lines, noTs, Strict)) }
    // timestamp only
    val tsOnly = parsed.select(col("l_shipdate"))
    time("parse-ts-only") { force(tsOnly) }
    // smaller partitions
    spark.conf.set("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
    val lines2 = spark.read.text(dir)
    println(s"PROBE partitions32mb=${lines2.rdd.getNumPartitions}")
    time("parse-32mb-parts") { force(FixedWidthParser.parse(lines2, Pipeline.lineitemFixed, Strict)) }
    spark.stop()
  }
}
