package graft.tools

import org.apache.spark.sql.functions._

/** Probe: max/mean relative error of the theta a_not_b churn estimate
  * at a given SF — documents the real headroom inside
  * [[graft.ops.Sessions.ThetaChurnBound]]. Runs the SHIPPED pipeline
  * ([[graft.ops.Sessions.eventsChurnDetail]]) on the engine's own
  * session so the measured draw is the one the gate actually sees. */
object ChurnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(8, "churn-probe")
    val err = graft.ops.Sessions.eventsChurnDetail(spark, dir)
      .select((abs(col("est") - col("churned")) / col("churned")).as("rel"),
        col("churned"))
    err.agg(max("rel").as("max_rel"), avg("rel").as("mean_rel"),
      avg("churned").as("mean_churned")).show(false)
    spark.stop()
  }
}
