package graft

import graft.ops.{Sessions, SetOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and identity coverage for the round-18 skew/join
  * additions: the salted exact-distinct (the value oracle checks the
  * counts; these pin the SHAPE — the salt must actually reach the
  * first exchange's keys, or the hot-reducer phase silently returns)
  * and the NULL-aware anti join (the oracle checks values on a
  * null-free fixture; these pin the three-valued semantics on data
  * WITH nulls, and that the plan is the hash form, not the
  * nested-loop degradation).
  */
class SkewNullAntiSpec extends SparkSpec {

  test("salted distinct equals the built-in countDistinct") {
    val salted = Sessions.eventsDistinctSalted(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sessions.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salt reaches the first exchange's partitioning keys") {
    val plan = Sessions.eventsDistinctSalted(spark, sf)
      .queryExecution.executedPlan.toString
    // The phase-1 exchange must key on (event_type, salt): that is the
    // whole point — without it the plan degenerates to the built-in
    // hot-reducer shape and the query is a slower spelling of it.
    val saltedExchange = plan.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("event_type") && l.contains("salt"))
    assert(saltedExchange, s"no (event_type, salt) exchange in plan:\n$plan")
  }

  test("NOT IN plans as a hash anti join, never a nested loop") {
    val plan = SetOps.qNullAnti(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"NOT IN degraded to a nested loop:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
  }

  test("NOT IN three-valued semantics on data with real nulls") {
    import spark.implicits._
    Seq(Some(1L), Some(2L), None).toDF("k").createOrReplaceTempView("na_left")
    Seq(Some(10L), Some(2L)).toDF("v").createOrReplaceTempView("na_right_clean")
    Seq(Some(10L), None).toDF("v").createOrReplaceTempView("na_right_null")
    // Clean subquery: NULL probe row is never admitted (unknown), 2 is
    // excluded, 1 survives.
    val clean = spark.sql(
      "SELECT k FROM na_left WHERE k NOT IN (SELECT v FROM na_right_clean)")
      .collect().map(_.getLong(0)).toSeq
    assert(clean == Seq(1L))
    // A NULL in the subquery makes every NOT IN comparison unknown —
    // the result is empty. This is the exact semantics a plain
    // left_anti join gets wrong (it would keep 1 and 2).
    val withNull = spark.sql(
      "SELECT k FROM na_left WHERE k NOT IN (SELECT v FROM na_right_null)")
      .count()
    assert(withNull == 0L)
  }
}
