package graft

import graft.functions.ThetaSketch
import graft.functions.ThetaSketch.{theta_intersect_estimate, theta_sketch_agg, theta_union_agg, ThetaBuffer}
import org.apache.spark.sql.functions._

/** The theta/KMV sketch's contracts: exactness below capacity (both
  * the distinct and the intersection estimates), the ~1/sqrt(k) error
  * bound in the estimating regime, mixed-k downsampling, the empty
  * edge cases, the serialization roundtrip Spark's partial aggregation
  * rides on — and the family's distinguishing property, that KMV state
  * is a pure set so shard-merge equals one-pass BYTE-FOR-BYTE (KLL's
  * compaction coin makes its merges order-visible; KMV's never are,
  * which is what lets a per-day sketch table be content-fingerprinted
  * deterministically). */
class ThetaSketchSpec extends SparkSpec {

  private def build(k: Int, keys: Iterable[Long]): ThetaBuffer = {
    val buf = new ThetaBuffer(k)
    keys.foreach(buf.update)
    buf
  }

  test("below capacity the sketch is the exact distinct set") {
    val buf = build(64, (1L to 50L) ++ (1L to 50L)) // duplicates collapse
    assert(buf.set.size == 50)
    assert(!buf.isFull)
    assert(buf.estimate == 50.0)
  }

  test("estimating regime: distinct estimate within ~3 standard errors") {
    // 100k distinct keys at k=1024: RSE ~ 1/sqrt(k-2) = 3.1%, bound at
    // 10% ≈ 3 sigma. The hash is deterministic so this particular draw
    // is a fixed number — it lands at 0.35% relative error, leaving the
    // bulk of the bound as genuine headroom against innocuous tweaks
    // (a different k or key set re-rolls the draw, it never "flakes").
    val n = 100000
    val buf = build(1024, (1L to n.toLong).map(_ * 48271L))
    assert(buf.isFull)
    val rel = math.abs(buf.estimate - n) / n
    assert(rel <= 0.10, s"estimate ${buf.estimate} off by ${rel * 100}%")
  }

  test("shard-merge equals one-pass byte-for-byte") {
    val keys = (1L to 20000L).map(ThetaSketch.splitmix64) // arbitrary spread
    val onePass = build(256, keys)
    for (shards <- Seq(2, 7, 64)) {
      val merged = new ThetaBuffer(0) // union aggregate's empty sentinel
      keys.grouped(math.max(1, keys.length / shards)).foreach { g =>
        merged.mergeFrom(build(256, g))
      }
      assert(java.util.Arrays.equals(merged.serialize(), onePass.serialize()),
        s"merge of $shards shards differs from the one-pass sketch")
    }
  }

  test("intersection is exact when both sketches are below capacity") {
    val a = build(4096, 1L to 600L)
    val b = build(4096, 401L to 1000L)
    val est = ThetaSketch.intersectEstimate(a.serialize(), b.serialize())
    assert(est == 200.0)
  }

  test("intersection estimate in the estimating regime tracks the true overlap") {
    // |A|=60k, |B|=60k, |A∩B|=30k, k=2048:
    // RSE ~ sqrt(|A∪B| / (k·|A∩B|)) = sqrt(90000/(2048·30000)) ≈ 3.8%;
    // 12% is ~3 sigma. Deterministic hash, fixed outcome.
    val a = build(2048, (1L to 60000L).map(_ * 1000003L))
    val b = build(2048, (30001L to 90000L).map(_ * 1000003L))
    assert(a.isFull && b.isFull)
    val est = ThetaSketch.intersectEstimate(a.serialize(), b.serialize())
    val rel = math.abs(est - 30000.0) / 30000.0
    assert(rel <= 0.12, s"intersection estimate $est off by ${rel * 100}%")
  }

  test("a_not_b is exact when both sketches are below capacity") {
    val a = build(4096, 1L to 600L)
    val b = build(4096, 401L to 1000L)
    assert(ThetaSketch.aNotBEstimate(a.serialize(), b.serialize()) == 400.0)
    assert(ThetaSketch.aNotBEstimate(b.serialize(), a.serialize()) == 400.0)
    // disjoint: difference is all of A; subset: difference is empty
    val c = build(4096, 2000L to 2599L)
    assert(ThetaSketch.aNotBEstimate(a.serialize(), c.serialize()) == 600.0)
    val sub = build(4096, 100L to 199L)
    assert(ThetaSketch.aNotBEstimate(sub.serialize(), a.serialize()) == 0.0)
    // exact decomposition below capacity: retained + churned = |A|
    assert(ThetaSketch.intersectEstimate(a.serialize(), b.serialize())
      + ThetaSketch.aNotBEstimate(a.serialize(), b.serialize()) == 600.0)
  }

  test("a_not_b estimate tracks the true difference and completes the intersection") {
    // same geometry as the intersection test: |A\B| = 30k of |A| = 60k.
    // RSE ~ sqrt(|A∪B| / (k·|A\B|)) = sqrt(90000/(2048·30000)) ≈ 3.8%;
    // 12% is ~3 sigma. Deterministic hash, fixed outcome.
    val a = build(2048, (1L to 60000L).map(_ * 1000003L))
    val b = build(2048, (30001L to 90000L).map(_ * 1000003L))
    val diff = ThetaSketch.aNotBEstimate(a.serialize(), b.serialize())
    val rel = math.abs(diff - 30000.0) / 30000.0
    assert(rel <= 0.12, s"a_not_b estimate $diff off by ${rel * 100}%")
    // decomposition at the shared capped theta: every A-sample hash
    // below theta_cap is counted exactly once as retained or churned,
    // so intersect + a_not_b is itself an estimator of |A| (at theta_cap
    // rather than theta_A) — churn + retention adds up to the day's
    // actives within the same sampling error
    val inter = ThetaSketch.intersectEstimate(a.serialize(), b.serialize())
    val relSum = math.abs((inter + diff) - 60000.0) / 60000.0
    assert(relSum <= 0.12,
      s"intersect $inter + a_not_b $diff should estimate |A|=60000, off by ${relSum * 100}%")
  }

  test("a_not_b empty edges: empty \\ X = 0, X \\ empty = estimate of X") {
    val empty = new ThetaBuffer(64)
    val x = build(64, 1L to 50L)
    assert(ThetaSketch.aNotBEstimate(empty.serialize(), x.serialize()) == 0.0)
    assert(ThetaSketch.aNotBEstimate(x.serialize(), empty.serialize()) == 50.0)
    assert(ThetaSketch.aNotBEstimate(empty.serialize(), empty.serialize()) == 0.0)
  }

  test("mixed-k union downsamples to the smaller k and stays accurate") {
    val big = build(2048, (1L to 50000L).map(_ * 31L))
    val small = build(256, (25001L to 75000L).map(_ * 31L))
    val u = new ThetaBuffer(0)
    u.mergeFrom(big)
    u.mergeFrom(small)
    assert(u.k == 256)
    assert(u.set.size == 256)
    val rel = math.abs(u.estimate - 75000.0) / 75000.0
    assert(rel <= 0.20, s"mixed-k union estimate ${u.estimate} off by ${rel * 100}%")
  }

  test("serialization roundtrip preserves the sketch exactly") {
    val buf = build(128, (1L to 5000L).map(_ * 13L))
    val back = ThetaSketch.deserialize(buf.serialize())
    assert(back.k == buf.k)
    assert(back.set.size == buf.set.size)
    assert(java.util.Arrays.equals(back.serialize(), buf.serialize()))
    assert(back.estimate == buf.estimate)
  }

  test("empty and sentinel edges: estimate 0, intersect 0, loud k=0 update") {
    val empty = new ThetaBuffer(64)
    assert(empty.estimate == 0.0)
    val full = build(64, 1L to 1000L)
    assert(ThetaSketch.intersectEstimate(empty.serialize(), full.serialize()) == 0.0)
    assert(ThetaSketch.intersectEstimate(empty.serialize(), empty.serialize()) == 0.0)
    val sentinel = new ThetaBuffer(0)
    val e = intercept[IllegalArgumentException] { sentinel.update(1L) }
    assert(e.getMessage.contains("uninitialized"))
  }

  test("daily sketch build plans a PARTIAL aggregate: map-side combine before the exchange") {
    val s = spark
    import s.implicits._
    // at 100 TB each task reduces its slice to one ≤k-hash sketch per
    // open day BEFORE the shuffle, so only sketches move — a
    // non-combining shape would shuffle every raw user_id row to its
    // day's reducer, the exact cost the mergeable sketch avoids
    val df = (1 to 2000).map(i => (i % 7, (i % 300).toLong)).toDF("day", "u")
      .groupBy("day").agg(theta_sketch_agg(col("u"), 64).as("sk"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_theta_sketch_agg"), p)
    val merged = df.agg(theta_union_agg(col("sk")))
    val pm = merged.queryExecution.executedPlan.toString
    assert(pm.contains("partial_theta_union_agg"), pm)
  }

  test("events_retention_range daily sketch table persists: second call loads, not rebuilds") {
    val root = java.nio.file.Files.createTempDirectory("graft-theta-store").toString
    spark.conf.set(graft.ops.IndexStore.RootConf, root)
    try {
      val b0 = graft.ops.IndexStore.builds.get()
      val r1 = graft.ops.Sessions.eventsRetentionRange(spark, sf).collect()
      assert(r1.length == 1 && r1.head.getBoolean(3), "range gate failed")
      assert(graft.ops.IndexStore.builds.get() == b0 + 1,
        "cold call must write exactly one sketch-table artifact")
      val r2 = graft.ops.Sessions.eventsRetentionRange(spark, sf).collect()
      assert(graft.ops.IndexStore.builds.get() == b0 + 1,
        "warm call rebuilt the sketch table instead of loading it")
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        "warm load diverged from the cold build")
    } finally spark.conf.unset(graft.ops.IndexStore.RootConf)
  }

  test("retention range edges: missing week-later day and zero overlap gate TRUE, never null") {
    val s = spark
    import s.implicits._
    def write(rows: Seq[(Long, String, Long)], prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      rows.map { case (id, ts, u) =>
        (id, java.sql.Timestamp.valueOf(ts), u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    // (a) the log spans 3 days, so day_lo+7 has no sketch row: the true
    // intersection is 0 and the gate must say so, not go null (the
    // oracle hard-codes TRUE — a null here is a silent verify mismatch)
    val short = write(Seq((1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-03 10:00:00", 8L)), "graft-rr-short")
    val a = graft.ops.Sessions.eventsRetentionRange(spark, short).collect()
    assert(a.length == 1, "must emit exactly one row")
    assert(a.head.getLong(2) == 0L && !a.head.isNullAt(3) && a.head.getBoolean(3),
      s"missing-day edge: ${a.head}")
    // (b) both days exist with disjoint users: retained = 0 is
    // representable here (global agg) — the gate demands an exactly-zero
    // estimate instead of dividing by zero
    val disjoint = write(Seq((1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-08 10:00:00", 8L)), "graft-rr-disj")
    val b = graft.ops.Sessions.eventsRetentionRange(spark, disjoint).collect()
    assert(b.length == 1, "must emit exactly one row")
    assert(b.head.getLong(2) == 0L && !b.head.isNullAt(3) && b.head.getBoolean(3),
      s"zero-overlap edge: ${b.head}")
  }

  test("DataFrame aggregate: per-group sketches union to the whole (exact regime)") {
    val s = spark
    import s.implicits._
    val df = (1 to 900).map(i => (i % 3, (i % 300).toLong)).toDF("g", "u")
    // 300 distinct keys < k=512: the unioned sketch is the exact set.
    val est = df.groupBy("g").agg(theta_sketch_agg(col("u"), 512).as("sk"))
      .agg(theta_union_agg(col("sk")).as("sk"))
      .select(graft.functions.ThetaSketch.theta_estimate(col("sk")))
      .head().getDouble(0)
    assert(est == 300.0)
    // and two disjoint-group sketches intersect to their true overlap
    val byParity = df.withColumn("p", col("u") % 2)
      .groupBy("p").agg(theta_sketch_agg(col("u"), 512).as("sk"))
      .orderBy("p").collect()
    val inter = ThetaSketch.intersectEstimate(
      byParity(0).getAs[Array[Byte]]("sk"), byParity(1).getAs[Array[Byte]]("sk"))
    assert(inter == 0.0, "even and odd key sketches must not intersect")
  }
}
