package graft

import graft.ops.{Layout, Sessions}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins for the data-layout operators: the value gates are the DuckDB
  * oracles (`q_bucketed_join`, `q_partition_prune`); these specs pin
  * the PHYSICAL properties the layouts exist for — the co-bucketed
  * join plans with zero shuffle exchanges, and the partitioned scan
  * reads only the filtered day directories (asserted on the executed
  * scan's file metric, not plan text). */
class LayoutSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // finalizes AQE so the inspected plan is the executed one
    df.queryExecution.executedPlan
  }

  // Shuffle exchanges render as "Exchange hashpartitioning" in the
  // final adaptive plan string (AQE hides the nodes from collect()
  // inside ShuffleQueryStageExec, whose children are empty — a
  // tree-walk for ShuffleExchangeExec is silently vacuous under AQE).
  private def shuffleCount(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    "Exchange hashpartitioning".r.findAllIn(plan.toString).length

  test("q_bucketed_join: join subtree has no shuffle exchange on either side") {
    val join = Layout.bucketedJoin(spark, sf)
    val plan = executed(join)
    assert(shuffleCount(plan) == 0,
      s"co-bucketed join must not reshuffle either fact side:\n$plan")
    assert(plan.toString.contains("SortMergeJoin"),
      s"the pinned property is the merge join's:\n$plan")
    // and it is not vacuous: the same join over the raw parquet DOES shuffle
    val raw = spark.read.parquet(s"$sf/lineitem.parquet").hint("merge")
      .join(spark.read.parquet(s"$sf/orders.parquet").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    assert(shuffleCount(executed(raw)) > 0,
      "control: unbucketed merge join should shuffle")
    // bucketed content is row-identical to the source
    assert(join.count() == raw.count())
  }

  test("q_partition_prune: scan reads only the filtered day directories") {
    val pruned = Layout.prunedScan(spark, sf)
    val plan = executed(pruned)
    val scans = (plan +: plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }).flatMap(_.collect { case s: FileSourceScanExec => s })
    assert(scans.nonEmpty, s"expected a file scan:\n$plan")
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    // 7 requested days, one file per day directory (staged that way);
    // an unpruned scan would read all 30
    assert(numFiles == 7,
      s"expected exactly the 7 filtered day files, read $numFiles:\n$plan")
    assert(plan.toString.contains("PartitionFilters"),
      s"day range must prune at planning time:\n$plan")
    // row content equals a post-hoc filter of the raw events
    val expected = Sessions.events(spark, sf)
      .filter(to_date(col("ts")).between(
        lit(Layout.PruneFrom).cast("date"), lit(Layout.PruneTo).cast("date")))
      .count()
    assert(pruned.count() == expected)
  }

  test("events_sketch_actives: gate green, estimates actually near exact, sketches mergeable") {
    val out = Sessions.eventsSketchActives(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("sketch_within_bound")),
      "every day's sketch estimate must sit inside the gate")
    // mergeability (the operator's reason to exist): the union of
    // per-day sketches estimates the same as one sketch over all rows
    val daily = Sessions.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val merged = daily.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    val direct = daily
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(merged == direct,
      s"union of daily sketches ($merged) must equal the one-pass sketch ($direct)")
  }

  test("events_rolling_actives: windows agree with a brute-force recount") {
    val out = Sessions.eventsRollingActives(spark, sf).collect()
    val activity = Sessions.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).distinct
    val days = activity.map(_._1).distinct.sorted
    assert(out.map(_.getDate(0).toLocalDate).toSeq == days.toSeq,
      "one output row per active day, ascending")
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val dau = activity.count(_._1 == d)
      val wau = activity.filter { case (ad, _) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(Sessions.RollingDays))
      }.map(_._2).distinct.length
      assert(r.getAs[Long]("active_1d") == dau, s"dau mismatch on $d")
      assert(r.getAs[Long]("active_7d") == wau, s"wau mismatch on $d")
    }
  }
}
