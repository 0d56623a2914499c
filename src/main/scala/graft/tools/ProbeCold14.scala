package graft.tools

import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame

/** Dev probe (round 14, VERDICT What's-wrong #1): reproduce the driver
  * record's native-vs-stock inversion on the narrow-row corpus and
  * price the mmap preload fix.
  *
  * Legs, on the cached 4.3 GB sf0.1 lineitem corpus:
  *  - warm: page-cache-resident A/B (the builder-idle baseline).
  *  - cold: `echo 3 > drop_caches` before EVERY timed run — the
  *    evicted-corpus state a memory-pressured driver day degrades to.
  *    Run for native preload=off (pre-r14 behavior), preload=load,
  *    preload=read, and stock.
  *  - loaded (optional arg `loaded`): same A/B with 32 busy-loop
  *    shells pinning the cores — prices pure CPU contention separately
  *    from cache pressure.
  *
  * Not engine surface; tools/ only. */
object ProbeCold14 {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def dropCaches(): Unit = {
    val rc = new ProcessBuilder("sh", "-c", "sync; echo 3 > /proc/sys/vm/drop_caches")
      .inheritIO().start().waitFor()
    if (rc != 0) System.err.println(s"[probe] drop_caches rc=$rc (not root?)")
    Thread.sleep(100)
  }
  private def stats(tag: String, xs: Seq[Double]): Unit =
    println(f"[probe] $tag: min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f " +
      xs.map(x => f"$x%.3f").mkString("[", ",", "]"))

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-cold14")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1-lineitem-4g"
    val schema = graft.ops.Pipeline.lineitemFixed
    def parsed() = FixedWidthParser.parse(
      graft.sources.FixedWidth.lines(spark, dir), schema, Strict)
    def leg(native: Boolean, preload: String, n: Int, cold: Boolean): Seq[Double] = {
      spark.conf.set(graft.sources.LineScan.Conf, native.toString)
      spark.conf.set(graft.sources.LineScan.PreloadConf, preload)
      force(parsed()) // codegen warmup (also warms cache; cold legs drop after)
      Seq.fill(n) {
        System.gc(); Thread.sleep(150)
        if (cold) dropCaches()
        t(force(parsed()))
      }
    }
    if (args.contains("sib")) {
      // Expects a sibling JVM (e.g. Verify at sf0.1) already running —
      // the r13-documented inversion trigger. Alternates short legs so
      // both sides sample the same contention window; prints loadavg
      // per leg.
      def la(): String = {
        try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0)
        catch { case _: Exception => "?" }
      }
      (1 to 4).foreach { round =>
        val n0 = leg(native = true, "off", 2, cold = false)
        val lA = la()
        val s0 = leg(native = false, "load", 2, cold = false)
        val lB = la()
        val n1 = leg(native = true, "load", 2, cold = false)
        val lC = la()
        stats(s"r$round native-off  (load $lA)", n0)
        stats(s"r$round stock       (load $lB)", s0)
        stats(s"r$round native-load (load $lC)", n1)
      }
    } else if (args.contains("loaded")) {
      val hogs = (1 to 32).map(_ =>
        new ProcessBuilder("sh", "-c", "while :; do :; done").start())
      try {
        Thread.sleep(500)
        stats("native-load warm +32hogs", leg(native = true, "load", 3, cold = false))
        stats("native-off  warm +32hogs", leg(native = true, "off", 3, cold = false))
        stats("stock       warm +32hogs", leg(native = false, "load", 3, cold = false))
      } finally hogs.foreach(_.destroyForcibly())
    } else {
      stats("native-load warm", leg(native = true, "load", 3, cold = false))
      stats("native-off  warm", leg(native = true, "off", 3, cold = false))
      stats("stock       warm", leg(native = false, "load", 3, cold = false))
      stats("native-off  COLD", leg(native = true, "off", 3, cold = true))
      stats("stock       COLD", leg(native = false, "load", 3, cold = true))
      stats("native-load COLD", leg(native = true, "load", 3, cold = true))
      stats("native-read COLD", leg(native = true, "read", 3, cold = true))
    }
    spark.stop()
  }
}
