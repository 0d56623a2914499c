package graft.tools

// One-query correctness dump: runMain graft.tools.DumpQ <sfDir> <outDir> <query ...>
// Writes outDir/<query> parquet exactly like Verify, for ad-hoc DuckDB compares.
object DumpQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { q =>
      graft.SparkEntry.queries(q)(spark, args(0))
        .coalesce(1).write.mode("overwrite").parquet(s"${args(1)}/$q")
      println(s"DUMPED $q")
    }
    spark.stop()
  }
}
