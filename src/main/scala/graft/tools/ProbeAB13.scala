package graft.tools

import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame

/** Dev probe (round 13): clean native-vs-stock parse A/B on the cached
  * narrow-row lineitem corpus — the smoke run's stock leg overlapped a
  * concurrent Verify JVM, so this re-prices both sides on an idle
  * machine. Not engine surface; tools/ only. */
object ProbeAB13 {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-ab13")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1-lineitem-4g"
    val schema = graft.ops.Pipeline.lineitemFixed
    def leg(native: Boolean): Seq[Double] = {
      spark.conf.set(graft.sources.LineScan.Conf, native.toString)
      val parsed = FixedWidthParser.parse(
        graft.sources.FixedWidth.lines(spark, dir), schema, Strict)
      force(parsed) // warmup
      Seq.fill(5) { System.gc(); Thread.sleep(150); t(force(parsed)) }
    }
    // interleave order to share any machine drift fairly
    val n1 = leg(native = true); val s1 = leg(native = false)
    val n2 = leg(native = true); val s2 = leg(native = false)
    def stats(tag: String, xs: Seq[Double]): Unit =
      println(f"[probe] $tag: min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f " +
        xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
    stats("native", n1 ++ n2); stats("stock ", s1 ++ s2)
    spark.stop()
  }
}
