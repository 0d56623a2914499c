package graft

import org.apache.spark.sql.functions._

/** Scale evidence: bucketed tables co-locate their join — the plan the
  * engine relies on for repeated fact-fact joins at 100 TB (bucket once,
  * join many times with zero shuffle). Asserted on the physical plan,
  * not just the result. */
class BucketingSpec extends SparkSpec {

  test("bucketBy on the join key eliminates the shuffle on both sides") {
    val li = graft.ops.Pipeline.lineitem(spark, sf)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_bucketed")
    // disable broadcast so the join strategy is the bucketed SMJ
    val joined = spark.table("li_bucketed")
      .join(spark.table("orders_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n${plan.take(800)}")
    // and it is still the correct join
    val expected = li.join(orders, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
  }
}
