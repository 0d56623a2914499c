package graft.tools

// Plan audit for the r15 batch-2 operators: exchange counts, reuse,
// partial aggs. runMain graft.tools.ProbePlans15b <sfDir>
object ProbePlans15b {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "probe-plans")
    val dir = args(0)
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect() // executes so AQE finalizes the real plan
      val p = df.queryExecution.executedPlan.toString
      def n(s: String) = s.r.findAllIn(p).length
      println(f"$name%-20s shuffles=${n("Exchange [a-z]+partitioning")} " +
        f"reused=${n("ReusedExchange")} bcast=${n("BroadcastExchange")} " +
        f"partialAgg=${n("HashAggregate.*partial|partial_")} " +
        f"bnlj=${n("BroadcastNestedLoop")} cart=${n("CartesianProduct")} " +
        f"sorts=${n("\\bSort \\[")}")
    }
    audit("events_funnel", graft.ops.Sessions.eventsFunnel(spark, dir))
    audit("events_retention", graft.ops.Sessions.eventsRetention(spark, dir))
    audit("events_quantiles", graft.ops.Sessions.eventsQuantiles(spark, dir))
    audit("corpus_repetition", graft.ops.TextAnalysis.corpusRepetition(spark, dir))
    audit("corpus_ngram_counts", graft.ops.TextAnalysis.corpusNgramCounts(spark, dir))
    audit("embedding_cluster", graft.ops.Similarity.embeddingCluster(spark, dir))
    spark.stop()
  }
}
