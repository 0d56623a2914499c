package graft.tools

import graft.ops.Similarity

/** Throwaway probe: executed-plan shape of the IVFADC paths at sf0.1. */
object ProbeIvfPqPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-ivfpq")
    try {
      val dir = "/root/testdata/sf0.1"
      for ((name, df) <- Seq(
        "staged" -> Similarity.similarityAnnIvfPqStaged(spark, dir),
        "filtered" -> Similarity.similarityAnnIvfPqFiltered(spark, dir))) {
        val t0 = System.nanoTime()
        df.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        println(s"=== $name: ${"%.2f".format(sec)}s")
        println(plan.linesIterator.filter(l =>
          l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("WholeStageCodegen") || l.contains("*(")).take(40).mkString("\n"))
      }
    } finally spark.stop()
  }
}
