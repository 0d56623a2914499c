package graft.tools
object ProbeIvfSqRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "ivfsq-recall")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val exact = graft.ops.Similarity.similarityTopk(spark, dir)
        .select("query_id", "neighbor_id")
      val ann = graft.ops.Similarity.similarityAnnIvfSq(spark, dir)
        .select("query_id", "neighbor_id")
      val hits = exact.intersect(ann).count()
      val total = exact.count()
      println(f"[ivfsq-recall] sf$sf recall@5 = ${hits.toDouble / total}%.4f ($hits/$total)")
    }
    spark.stop()
  }
}
