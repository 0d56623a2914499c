package graft.tools

import org.apache.spark.sql.functions._

// Does Spark's exact `percentile` reproduce DuckDB's quantile_cont
// bit-for-bit on the events fixture? runMain graft.tools.ProbeQuantile15 <sfDir>
object ProbeQuantile15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "probe-quantile")
    val ev = graft.ops.Sessions.events(spark, args(0))
    ev.groupBy("event_type").agg(
      percentile(col("value"), lit(0.5)).as("p50"),
      percentile(col("value"), lit(0.95)).as("p95"),
      median(col("value")).as("med"))
      .orderBy("event_type")
      .collect().foreach(r => println(
        f"${r.getString(0)}%-10s p50=${r.getDouble(1)}%.17g p95=${r.getDouble(2)}%.17g med=${r.getDouble(3)}%.17g"))
    spark.stop()
  }
}
