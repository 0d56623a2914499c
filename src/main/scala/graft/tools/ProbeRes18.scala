package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Stage-time probe that found the residual lane's per-pair LUT
  * recompute (r18): the first canonical record priced
  * similarity_ann_ivfpq_res at 5.25 s vs the raw lane's 1.38 s. The
  * pair stage measured 75 CPU-s for 3M pairs (~25 µs/pair): without a
  * materialization barrier, whole-stage codegen fused the probe-side
  * LUT projection into the candidate join's stage and deferred the
  * expression to its use site INSIDE the per-match loop — the full
  * residual+distance-table computation re-ran once per pair. With the
  * keepWhereNotNull/Generate barrier (the §8j discipline one level
  * deeper — this time the re-evaluator is codegen deferral, not
  * filter pushdown) the stage drops to ~8.6 CPU-s / 2.0 s wall, at
  * parity with the raw lane.
  */
object ProbeRes18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-res18")
    val stages = mutable.Map[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages(sc.stageInfo.stageId) =
          (sc.stageInfo.taskMetrics.executorRunTime, sc.stageInfo.numTasks)
    })
    val dir = "/root/testdata/sf0.1"
    import graft.ops.Similarity
    Similarity.similarityAnnIvfPqRes(spark, dir).write.format("noop").mode("overwrite").save()
    Thread.sleep(500); stages.clear()
    val t0 = System.nanoTime()
    Similarity.similarityAnnIvfPqRes(spark, dir).write.format("noop").mode("overwrite").save()
    println(f"WALL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    stages.toSeq.sortBy(-_._2._1).take(5).foreach { case (id, (rt, nt)) =>
      println(f"STG $id%4d run=${rt / 1000.0}%8.2fs tasks=$nt%3d")
    }
    spark.stop()
  }
}
