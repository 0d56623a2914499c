package graft.tools

/** Dev probe (r14): plan audit + timing for corpus_decontam at sf0.1 —
  * confirms the two joins broadcast (map-side filter, no corpus-scale
  * shuffle). Not engine surface; tools/ only. */
object ProbeDecontam14 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-decontam14")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = graft.ops.Dedup.corpusDecontam(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("[probe] BroadcastHashJoin count: " +
      "BroadcastHashJoin".r.findAllIn(plan).size)
    println("[probe] SortMergeJoin count: " +
      "SortMergeJoin".r.findAllIn(plan).size)
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(): Unit =
      graft.ops.Dedup.corpusDecontam(spark, dir)
        .write.format("noop").mode("overwrite").save()
    force()
    val runs = Seq.fill(3)(t(force()))
    println(f"[probe] corpus_decontam sf0.1: min=${runs.min}%.3f " +
      runs.map(x => f"$x%.3f").mkString("[", ",", "]"))
    spark.stop()
  }
}
