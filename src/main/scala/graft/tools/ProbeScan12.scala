package graft.tools

import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame

/** Dev probe (round 12): attributes the LineScan narrow-row parse
  * regression (lineitem leg r10 2.53 s stock -> r11 4.76 s native).
  * A/B of stock text source vs native LineScan on the cached 4 GiB
  * lineitem corpus: scan-only and full parse, with task counts.
  * Not engine surface; tools/ only. */
object ProbeScan12 {
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
    val spark = graft.GraftSession.local(32, "probe-scan12")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1-lineitem-4g"
    val schema = graft.ops.Pipeline.lineitemFixed
    val legs = if (args.isEmpty) Set("native", "stock") else args.toSet

    if (legs("stock")) {
      val stock = spark.read.text(dir)
      val parsedStock = FixedWidthParser.parse(stock, schema, Strict)
      force(parsedStock)
      println("[probe] stock scan partitions: " + stock.rdd.getNumPartitions)
      runs("stock_scan", 3)(force(stock))
      runs("stock_parse", 5)(force(parsedStock))
    }
    if (legs("native")) {
      val native = graft.sources.LineScan.read(spark, dir)
      val parsedNative = FixedWidthParser.parse(native, schema, Strict)
      force(parsedNative)
      println("[probe] native scan partitions: " + native.rdd.getNumPartitions)
      runs("native_scan", 3)(force(native))
      runs("native_parse", 5)(force(parsedNative))
    }
    spark.stop()
  }
}
