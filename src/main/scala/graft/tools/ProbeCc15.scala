package graft.tools

import org.apache.spark.sql.functions._

// Phase timing for dedup_clusters: minhash pair materialization vs CC
// iterations. runMain graft.tools.ProbeCc15 <sfDir>
object ProbeCc15 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = args(0)
    val pairs = time("minhash-pairs") {
      val p = graft.ops.Dedup.dedupMinhash(spark, dir)
        .select(col("doc_a"), col("doc_b")).persist()
      println(s"  pairs = ${p.count()}")
      p
    }
    val cc = time("cc-iterations") {
      val c = graft.ops.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      println(s"  nodes = ${c.count()}")
      c
    }
    time("orderBy+write") {
      cc.orderBy("doc_id").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
