package graft.tools

/** Dev probe (round 13): the weblog OCF tmpfs-wall leg in isolation —
  * the r11→r12 bench recorded +42% (1.22 → 1.73 s) on this leg, which
  * tmpfs should shield from disk drift. Runs the exact bench dataflow
  * (native scan → fused line→Avro → block append into /dev/shm) on the
  * cached sf0.1 corpus so the same command can price HEAD and the r11
  * tree on the SAME data/day (the established old-commit-on-today's-
  * data attribution method). Not engine surface; tools/ only. */
object ProbeOcfRam {
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-ocf-ram")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0)
      else "/tmp/graft-bench-corpus/_root_testdata_sf0.1-weblog-4g"
    val schema = graft.Bench.weblogFixed
    val lineDf = graft.sources.FixedWidth.lines(spark, dir)
    val ramDir = "/dev/shm/graft-probe-ocf-ram"
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete()
    }
    // warmup (codegen + page-cache)
    graft.sources.Ocf.writeFixed(lineDf, schema, ramDir)
    deleteRec(new java.io.File(ramDir))
    val n = 5
    val xs = Seq.fill(n) {
      System.gc(); Thread.sleep(200)
      val s = t(graft.sources.Ocf.writeFixed(lineDf, schema, ramDir))
      deleteRec(new java.io.File(ramDir))
      s
    }
    println(f"[probe] ocf_ram weblog: min=${xs.min}%.3f " +
      f"med=${xs.sorted.apply(n / 2)}%.3f " +
      xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
    spark.stop()
  }
}
