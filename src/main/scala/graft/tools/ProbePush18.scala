package graft.tools

// r18: where else does filter-on-alias substitution re-evaluate an
// expensive expression? Count occurrences in executed plans.
object ProbePush18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "push18-probe")
    val sf = "/root/testdata/sf0.001"
    def occ(name: String, df: org.apache.spark.sql.DataFrame, needle: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"[$name] '$needle' x " + needle.r.findAllIn(plan).length)
    }
    occ("dedup_minhash", graft.ops.Dedup.dedupMinhash(spark, sf), "array_intersect")
    occ("dedup_minhash", graft.ops.Dedup.dedupMinhash(spark, sf), "minhash64")
    occ("dedup_simhash", graft.ops.Dedup.dedupSimhash(spark, sf), "simhash64")
    occ("dedup_embedding", graft.ops.Dedup.dedupEmbedding(spark, sf), "vec_dot")
    occ("embedding_cluster", graft.ops.Similarity.embeddingCluster(spark, sf), "centroid_sims")
    occ("ann_ivfpq", graft.ops.Similarity.similarityAnnIvfPq(spark, sf), "pq_code_argmin")
    occ("ann_ivfpq", graft.ops.Similarity.similarityAnnIvfPq(spark, sf), "centroid_sims")
    occ("sq_topk", graft.ops.Similarity.similaritySqTopk(spark, sf), "sq_encode")
    occ("sq_topk", graft.ops.Similarity.similaritySqTopk(spark, sf), "sq_adc_l2")
    spark.stop()
  }
}
