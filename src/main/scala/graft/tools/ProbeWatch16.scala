package graft.tools

import graft.Bench

/** r16 watch-list attribution (VERDICT #3): re-price the four
  * documents-table queries that drifted up on r15's contended record
  * (`corpus_pack` 0.40→0.74, `dedup_ngram` 1.39→1.67, `doc_embed`
  * 0.93→1.07, `doc_fingerprint` 0.37→0.43) under the EXACT bench
  * configuration (local[32], shuffle=32, noop sink, gc+io barrier per
  * run) with a micro-cal before every run, so each time is read against
  * the CPU the machine was giving at that moment. r14/r15 engine diff
  * for corpus_pack was oracle-only (commit 99d4819 — CAST in DuckDB
  * SQL), so an engine-time move must be machine or fixture, not code.
  *
  *   runMain graft.tools.ProbeWatch16 /root/testdata/sf0.1 [runs]
  */
object ProbeWatch16 {
  val Watch = Seq("corpus_pack", "dedup_ngram", "doc_embed", "doc_fingerprint")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.local(32, "probe-watch16")
    spark.sparkContext.setLogLevel("WARN")
    Watch.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val samples = (0 to runs).map { i =>
        Bench.ioBarrier(); Bench.gcBarrier()
        val cal = Bench.microCal()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"RUN $q%-16s i=$i cal=$cal%.0f t=$s%.2f s")
        (s, cal)
      }.drop(1) // warmup excluded, same as the sweep
      val med = Bench.median(samples.map(_._1))
      val min = samples.map(_._1).min
      val calMed = Bench.median(samples.map(_._2))
      println(f"WATCH $q%-16s median=$med%.2f min=$min%.2f cal_median=$calMed%.0f")
    }
    spark.stop()
  }
}
