package graft.tools

import graft.functions.ThetaSketch.{theta_anotb_estimate, theta_sketch_agg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: max/mean relative error of the theta a_not_b churn estimate
  * at a given SF — documents the real headroom inside ThetaChurnBound. */
object ChurnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .appName("churn-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val du = spark.read.parquet(s"$dir/events.parquet")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = du.groupBy("day")
      .agg(theta_sketch_agg(col("user_id"), graft.ops.Sessions.ThetaK).as("sk"))
    val nextDay = daily.select(date_sub(col("day"), 1).as("day"), col("sk").as("sk_next"))
    val est = daily.join(nextDay, Seq("day"))
      .select(col("day"), theta_anotb_estimate(col("sk"), col("sk_next")).as("est"))
    val du1 = du.dropDuplicates("day", "user_id")
    val nextUsers = du1.select(date_sub(col("day"), 1).as("day"), col("user_id"))
    val exact = du1.join(nextUsers, Seq("day", "user_id"), "left_anti")
      .groupBy("day").agg(count(lit(1)).as("churned"))
    val err = exact.join(est, Seq("day"))
      .select((abs(col("est") - col("churned")) / col("churned")).as("rel"),
        col("churned"), col("est"))
    err.agg(max("rel").as("max_rel"), avg("rel").as("mean_rel"),
      avg("churned").as("mean_churned")).show(false)
    spark.stop()
  }
}
