package graft.tools

/** r21: execute a query via the noop sink, then print the FINAL
  * adaptive plan (post-execution) so runtime stage reuse
  * (ReusedExchange / reused ShuffleQueryStage ids) is visible. */
object FinalPlan21 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-finalplan-r21")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.tail.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $q (final adaptive plan) =====")
      // executedPlan after execution reflects the final AQE plan
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
