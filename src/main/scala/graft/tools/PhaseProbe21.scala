package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** r21: print QueryPlanningTracker phase durations (parsing/analysis/
  * optimization/planning) for the noop-write execution of each query —
  * attributes the driver-side gap between action start and the first
  * real stage. */
object PhaseProbe21 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-phase-r21")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val ph = qe.tracker.phases.map { case (k, v) =>
          f"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}%.3f"
        }.mkString(" ")
        println(f"PHASES total=${durationNs / 1e9}%.3f $ph")
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(300)
      println(s"===== $q warm run =====")
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300)
    }
    spark.stop()
  }
}
