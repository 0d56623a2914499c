package graft.tools

/** One-off r19 probe: run corpus_heavy_hitters_sketch at all three SFs
  * and print whether every gate row is true (the gate is deterministic
  * — fixed CMS seed — so one pass per SF settles it). Delete after use
  * or keep as the CMS diagnostic. */
object ProbeCms19 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "probe-cms19")
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val rows = graft.ops.TextAnalysis
        .corpusHeavyHittersSketch(spark, s"/root/testdata/$sf").collect()
      val bad = rows.filterNot(_.getBoolean(3))
      println(s"CMS $sf rows=${rows.length} gate_failures=${bad.length}" +
        (if (bad.nonEmpty) s" e.g. ${bad.head}" else ""))
    }
    spark.stop()
  }
}
