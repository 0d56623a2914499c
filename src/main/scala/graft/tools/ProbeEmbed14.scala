package graft.tools

/** Dev probe (r14): plan audit + timing for doc_embed at sf0.1 —
  * confirms one partial-aggregated id-keyed shuffle and no extra
  * exchange for the normalize projection. Not engine surface. */
object ProbeEmbed14 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-embed14")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = graft.ops.TextAnalysis.docEmbed(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("[probe] Exchange count: " + "Exchange".r.findAllIn(plan).size)
    println("[probe] partial HashAggregate: " +
      plan.contains("partial_sum"))
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(): Unit = graft.ops.TextAnalysis.docEmbed(spark, dir)
      .write.format("noop").mode("overwrite").save()
    force()
    val runs = Seq.fill(3)(t(force()))
    println(f"[probe] doc_embed sf0.1: min=${runs.min}%.3f " +
      runs.map(x => f"$x%.3f").mkString("[", ",", "]"))
    spark.stop()
  }
}
