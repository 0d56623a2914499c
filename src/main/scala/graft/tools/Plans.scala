package graft.tools

// Plan-audit utility: prints the formatted physical plan of selected
// registered queries so shuffle/broadcast/codegen structure can be
// reviewed. Run: sbt "runMain graft.tools.Plans [queryName ...]"
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
