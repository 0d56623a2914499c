package graft.tools
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "recall-probe")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = graft.ops.Similarity.similarityTopk(spark, sf)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (probes <- Seq(6, 8, 10, 12)) {
        val ann = graft.ops.Similarity.similarityAnnIvf(spark, sf, probes)
          .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[recall] $sf probes=$probes: ${(exact & ann).size.toDouble / exact.size}%.4f")
      }
    }
    spark.stop()
  }
}
