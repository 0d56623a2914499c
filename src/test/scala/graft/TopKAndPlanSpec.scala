package graft

import graft.functions.TopK.topk_by_score
import graft.ops.{Relational, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate and the scale-shape plan assertions the
  * round-3 verdict demanded: similarity_topk must never plan a
  * cartesian / broadcast-nested-loop join, and the big relational
  * joins must survive (and stay correct) with broadcast disabled. */
class TopKAndPlanSpec extends SparkSpec {

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("topk_by_score ≡ window row_number top-k (ties broken by id asc)") {
    import spark.implicits._
    // deliberate score ties (score = v % 3) to pin the id tie-break
    val rows = (1L to 97L).map(v => (v % 7, (v % 3).toDouble, v))
    val df = rows.toDF("g", "score", "id")
    val viaAgg = df.groupBy("g")
      .agg(topk_by_score(col("score"), col("id"), 4).as("nn"))
      .select(col("g"), posexplode(col("nn")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("s.id").as("id"),
        col("s.score").as("score"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.select(col("g"), col("score"), col("id"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= 4)
      .select(col("g"), col("rank"), col("id"), col("score"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("topk_by_score ranks NaN scores first, like the window desc sort") {
    import spark.implicits._
    // Spark's double total order sorts NaN above every value under
    // desc; the aggregate must agree (a zero-norm embedding yields a
    // NaN cosine, and the two formulations must not diverge on it).
    val rows = Seq((1L, Double.NaN, 1L), (1L, 0.9, 2L), (1L, Double.NaN, 3L),
      (1L, 0.7, 4L), (1L, 0.8, 5L))
    val df = rows.toDF("g", "score", "id")
    val viaAgg = df.groupBy("g")
      .agg(topk_by_score(col("score"), col("id"), 3).as("nn"))
      .select(posexplode(col("nn")).as(Seq("pos", "s")))
      .select(col("s.id")).as[Long].collect().toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.select(col("id"), row_number().over(w).as("rank"))
      .filter(col("rank") <= 3).orderBy("rank")
      .select(col("id")).as[Long].collect().toSeq
    assert(viaAgg == viaWindow && viaAgg == Seq(1L, 3L, 2L))
  }

  test("topk_by_score keeps fewer than k when the group is small") {
    import spark.implicits._
    val out = Seq((1L, 0.5, 10L), (1L, 0.7, 11L)).toDF("g", "score", "id")
      .groupBy("g").agg(topk_by_score(col("score"), col("id"), 5).as("nn"))
      .select(size(col("nn"))).as[Int].head()
    assert(out == 2)
  }

  test("similarity_topk plans no CartesianProduct / BroadcastNestedLoopJoin") {
    val plan = executed(Similarity.similarityTopk(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"quadratic join shape in plan:\n${plan.take(1200)}")
  }

  test("query-broadcast gate: fixture fits, an 8 GB-ceiling-breaking corpus falls back") {
    // fixture scale: 2000 x 64-dim x 4 blocks ≈ 4.4 MB — broadcasts
    assert(Similarity.queryBroadcastBytes(2000, 64, 4) <= Similarity.MaxQueryBroadcastBytes)
    // 10M 1536-dim queries x 4 blocks ≈ 493 GB — must take the shuffle
    // regime, not explode on the broadcast ceiling
    assert(Similarity.queryBroadcastBytes(10000000, 1536, 4) > Similarity.MaxQueryBroadcastBytes)
    // the gate bound itself keeps 4x headroom under Spark's 8 GB hard cap
    assert(Similarity.MaxQueryBroadcastBytes * 4 <= (8L << 30))
    // and the broadcast pin IS present on the fixture plan (the r16
    // build-side flip regression this pin exists for)
    val plan = executed(Similarity.similarityTopk(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"fixture-scale query side must broadcast:\n${plan.take(1200)}")
  }

  test("similarity joins fan the pair compute out past the corpus scan's splits") {
    // The fixture corpus is one tiny parquet file = ONE scan split, and
    // the optimizer (correctly) broadcasts the replicated query side of
    // the blocked join — so without the explicit corpus-side exchange
    // the whole O(N*queries) dot-product stage runs on a single core
    // (the real shape of the r8-r11 similarity_topk creep: 4.09 s at
    // sf0.1 single-task, 0.8 s fanned out). Pin the exchange: a plan
    // that loses it silently re-serializes the quadratic stage.
    // keys must sit inside the SAME hashpartitioning clause: `blk` alone
    // hashes into at most Blocks(=16) distinct groups — half a 32-core
    // cluster idle — so losing `neighbor_id` from the exchange is a
    // regression this pin must catch, not just losing the exchange.
    val topk = executed(Similarity.similarityTopk(spark, sf))
    assert("hashpartitioning\\(blk[^)]*neighbor_id".r.findFirstIn(topk).isDefined,
      s"no (blk, neighbor_id) fan-out exchange in similarity_topk plan:\n${topk.take(1500)}")
    val ivf = executed(Similarity.similarityAnnIvf(spark, sf))
    assert("hashpartitioning\\(cell[^)]*vec_id".r.findFirstIn(ivf).isDefined,
      s"no (cell, vec_id) fan-out exchange in similarity_ann_ivf plan:\n${ivf.take(1500)}")
    // dedup_embedding's 2048-dot signature projection has the same
    // single-split collapse (r13): the explicit vec_id repartition must
    // sit under the banded self-join, or the whole projection runs at
    // the corpus scan's one split. REPARTITION_BY_NUM distinguishes the
    // explicit fan-out from the verify joins' incidental
    // ENSURE_REQUIREMENTS exchanges on the same key.
    val emb = executed(graft.ops.Dedup.dedupEmbedding(spark, sf))
    assert("hashpartitioning\\(vec_id[^,]*, \\d+\\), REPARTITION_BY_NUM".r
        .findFirstIn(emb).isDefined,
      s"no vec_id fan-out exchange in dedup_embedding plan:\n${emb.take(1500)}")
  }

  test("document signature stages fan out past the documents scan's split") {
    // Same collapse, text families (r13): shingling / minhash mins /
    // simhash bit votes / quality metrics / winnowing all run map-side
    // BEFORE their first shuffle — at the documents scan's ONE split
    // for a small parquet — unless Docs.fanned's explicit doc_id
    // exchange sits under them (measured: text_analysis 1.46 -> 0.67 s
    // at sf0.1; a pure map-side query is otherwise 100% single-core).
    val docFan = "hashpartitioning\\(doc_id[^,]*, \\d+\\), REPARTITION_BY_NUM".r
    Seq(
      "dedup_minhash" -> executed(graft.ops.Dedup.dedupMinhash(spark, sf)),
      "text_analysis" -> executed(graft.ops.TextAnalysis.textAnalysis(spark, sf)),
      "doc_fingerprint" -> executed(graft.ops.TextAnalysis.docFingerprint(spark, sf))
    ).foreach { case (name, plan) =>
      assert(docFan.findFirstIn(plan).isDefined,
        s"no doc_id fan-out exchange in $name plan:\n${plan.take(1500)}")
    }
  }

  test("session keeps the object-hash-aggregate fallback threshold raised") {
    // GraftSession sets spark.sql.objectHashAggregate.sortBased
    // .fallbackThreshold to 4096: the engine's TypedImperativeAggregates
    // hold BOUNDED k-entry buffers, and Spark's default of 128 made any
    // task with >128 groups abandon the hash map and SORT all scored
    // pairs (measured on similarity_topk at sf0.1: 3.8 -> 2.7 s from
    // this setting alone). Removing the config silently reverts that.
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == "4096")
  }

  test("q3/q5 survive with broadcast disabled (no forced broadcast hint)") {
    val q5Rows = Relational.q5NationVolume(spark, sf).count()
    val q3Rows = Relational.q3TopOrders(spark, sf).count()
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    val prevAqe = scala.util.Try(
      conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
      .flatMap(Option(_))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val q5 = Relational.q5NationVolume(spark, sf)
      val plan5 = executed(q5)
      // nation/region keep their constant-size hints; the customer join
      // must have degraded gracefully to a shuffle join, not a broadcast
      assert(plan5.contains("SortMergeJoin") || plan5.contains("ShuffledHashJoin"),
        s"q5 has no shuffle join with broadcast disabled:\n${plan5.take(1200)}")
      assert(q5.count() == q5Rows)
      assert(Relational.q3TopOrders(spark, sf).count() == q3Rows)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("similarity_ann_recall reports the floor met on the fixture") {
    val row = Similarity.similarityAnnRecall(spark, sf).collect()
    assert(row.length == 1 && row(0).getAs[Boolean]("recall_ok"))
  }

  test("q17 correlated subquery decorrelates to an aggregate + join (no loops)") {
    val q = Relational.q17SmallQtyRevenue(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // Catalyst must have rewritten the per-row correlated avg into a
    // per-partkey aggregate joined back on the correlation key — the
    // naive reading (re-scan lineitem per outer row) would surface as
    // a nested-loop/cartesian operator.
    assert(!plan.contains("CartesianProduct"), "cartesian in q17 plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested loop in q17 plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate in q17 plan:\n${plan.take(800)}")
    // the decorrelated agg joins back on l_partkey
    assert(plan.contains("partkey"), s"no partkey join in q17 plan:\n${plan.take(800)}")
    // and the result is non-degenerate on the fixture
    assert(q.collect().head.getDouble(0) > 0.0)
  }
}
