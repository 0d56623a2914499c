package graft.tools

/** Dev probe (round 13): prices the document-family queries whose
  * signature stages run at the documents scan's partitioning — before
  * and after fanning the scan out to cluster parallelism. */
object ProbeDocsFan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-docsfan")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val qs = Seq("dedup_minhash", "dedup_ngram", "dedup_simhash",
      "corpus_clean", "text_analysis", "doc_fingerprint",
      "multimodal_features", "dedup_exact")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    qs.foreach { q =>
      def run(): Unit = graft.SparkEntry.queries(q)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      run() // warmup
      val xs = Seq.fill(3) { System.gc(); Thread.sleep(100); t(run()) }
      println(f"[probe] $q%-22s med=${xs.sorted.apply(1)}%.3f " +
        xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
