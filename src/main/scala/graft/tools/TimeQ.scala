package graft.tools

// Quick per-query timing: runMain graft.tools.TimeQ <sfDir> <query ...>
// Core count via SPARK_GRAFT_CPUS (default 8; set 32 to match bench).
object TimeQ {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      // noop sink: forces every output column (count() lets Catalyst
      // prune the whole projection and times nothing).
      graft.SparkEntry.queries(q)(spark, args.head)
        .write.format("noop").mode("overwrite").save()
      println(f"TIME $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
