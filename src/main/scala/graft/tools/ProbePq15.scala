package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Measure PQ ADC+rerank recall@5 vs the exact baseline per SF, to set
  * [[Similarity.PqRecallFloor]] from data. Rerunnable:
  * `sbt "runMain graft.tools.ProbePq15"`. */
object ProbePq15 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe-pq15")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val exact = Similarity.similarityTopk(spark, dir)
        .select(col("query_id"), col("neighbor_id"))
      val pq = Similarity.similarityPqTopk(spark, dir)
        .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
      val recall = exact.join(pq, Seq("query_id", "neighbor_id"), "left_outer")
        .agg((sum(coalesce(col("hit"), lit(0L))) / count(lit(1L))).as("recall"))
        .head().getDouble(0)
      println(s"PQRECALL sf$sf recall@5=$recall")
    }
    spark.stop()
  }
}
