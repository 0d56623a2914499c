package graft

import graft.functions.KllSketch
import graft.functions.KllSketch.{kll_merge_agg, kll_quantile, kll_sketch_agg, KllBuffer}
import org.apache.spark.sql.functions._

/** The KLL quantile sketch's contracts: exactness below capacity,
  * exact weight conservation always, the rank-error bound under heavy
  * compaction, merge ≡ single-stream build (same bound), and the
  * serialization roundtrip Spark's partial aggregation rides on. */
class KllSketchSpec extends SparkSpec {

  private def rankOf(sorted: Array[Double], v: Double): (Double, Double) = {
    // empirical rank interval of v: (cdf(<v), cdf(<=v)]
    val n = sorted.length.toDouble
    var lo = 0; var hi = 0
    var i = 0
    while (i < sorted.length) {
      if (sorted(i) < v) lo += 1
      if (sorted(i) <= v) hi += 1
      i += 1
    }
    (lo / n, hi / n)
  }

  private def assertRankClose(data: Array[Double], buf: KllBuffer,
      qs: Seq[Double], tol: Double): Unit = {
    val sorted = data.sorted
    qs.foreach { q =>
      val v = buf.quantile(q)
      val (lo, hi) = rankOf(sorted, v)
      assert(lo - tol <= q && hi + tol >= q,
        s"q=$q returned v=$v spanning ranks ($lo, $hi] — outside ±$tol")
    }
  }

  test("below capacity the sketch is exact (no compaction has happened)") {
    val buf = new KllBuffer(64)
    val data = (1 to 50).map(_.toDouble).reverse.toArray
    data.foreach(buf.update)
    assert(buf.n == 50)
    assert(buf.compactions == 0L, "no compaction should trigger below k")
    // rank ceil(q*n) exactly
    assert(buf.quantile(0.5) == 25.0)
    assert(buf.quantile(0.02) == 1.0)
    assert(buf.quantile(1.0) == 50.0)
  }

  test("weight is conserved exactly through compactions and merges") {
    val rnd = new scala.util.Random(7)
    val buf = new KllBuffer(32)
    (1 to 10000).foreach(_ => buf.update(rnd.nextDouble()))
    assert(buf.compactions > 0L, "fixture must actually compact")
    assert(buf.n == 10000)
    val weights = buf.levels.indices.map(i => buf.sizes(i).toLong << i).sum
    assert(weights == 10000L, s"total item weight $weights != n 10000")
    val other = new KllBuffer(32)
    (1 to 3333).foreach(_ => other.update(rnd.nextDouble()))
    buf.mergeFrom(other)
    val w2 = buf.levels.indices.map(i => buf.sizes(i).toLong << i).sum
    assert(buf.n == 13333 && w2 == 13333L)
  }

  test("rank error stays inside the gate under heavy compaction (uniform + skewed)") {
    val rnd = new scala.util.Random(42)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    val uniform = Array.fill(200000)(rnd.nextDouble())
    val bufU = new KllBuffer(graft.ops.Sessions.KllK)
    uniform.foreach(bufU.update)
    assertRankClose(uniform, bufU, qs, graft.ops.Sessions.KllRankTol)
    // heavy-tailed with massive ties: the rank-interval gate must stay
    // tie-safe where a value-space compare would be meaningless
    val skewed = Array.fill(200000)(math.floor(math.pow(rnd.nextDouble(), 4) * 20))
    val bufS = new KllBuffer(graft.ops.Sessions.KllK)
    skewed.foreach(bufS.update)
    assertRankClose(skewed, bufS, qs, graft.ops.Sessions.KllRankTol)
  }

  test("merging shard sketches meets the same bound as one pass, any shard count") {
    val rnd = new scala.util.Random(11)
    val data = Array.fill(120000)(rnd.nextGaussian() * 10 + 3)
    val qs = Seq(0.1, 0.5, 0.9, 0.95)
    Seq(2, 7, 64).foreach { shards =>
      val merged = new KllBuffer(0) // the merge aggregate's k=0 sentinel
      data.grouped(math.ceil(data.length.toDouble / shards).toInt).foreach { chunk =>
        val sk = new KllBuffer(graft.ops.Sessions.KllK)
        chunk.foreach(sk.update)
        merged.mergeFrom(KllSketch.deserialize(sk.serialize()))
      }
      assert(merged.n == data.length)
      assertRankClose(data, merged, qs, graft.ops.Sessions.KllRankTol)
    }
  }

  test("serialization roundtrip preserves the sketch exactly") {
    val rnd = new scala.util.Random(3)
    val buf = new KllBuffer(32)
    (1 to 5000).foreach(_ => buf.update(rnd.nextDouble() * 100))
    val back = KllSketch.deserialize(buf.serialize())
    assert(back.k == buf.k && back.n == buf.n && back.compactions == buf.compactions)
    assert(back.sizes.toSeq == buf.sizes.toSeq)
    Seq(0.1, 0.5, 0.9).foreach(q => assert(back.quantile(q) == buf.quantile(q)))
  }

  test("mismatched-k merge fails loudly; empty sketch quantile is null via expression") {
    val a = new KllBuffer(32); a.update(1.0)
    val b = new KllBuffer(64); b.update(2.0)
    val e = intercept[IllegalArgumentException](a.mergeFrom(b))
    assert(e.getMessage.contains("different k"))
    val s = spark
    import s.implicits._
    // empty group: the build aggregate emits an n=0 blob, kll_quantile null
    val row = Seq((1L, Option.empty[Double])).toDF("g", "v")
      .groupBy("g").agg(kll_sketch_agg(col("v"), 32).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5)).as("q")).head()
    assert(row.isNullAt(0))
  }

  test("daily sketch build plans a PARTIAL aggregate: map-side combine before the exchange") {
    val s = spark
    import s.implicits._
    // what matters at 100 TB: each task reduces its slice to one ~3k-item
    // sketch per open group BEFORE the shuffle, so only sketches move —
    // a non-combining shape would shuffle every raw value to its group's
    // reducer (the exact cost the mergeable sketch exists to avoid)
    val df = (1 to 2000).map(i => (s"t${i % 3}", i % 7, i.toDouble))
      .toDF("event_type", "day", "v")
      .groupBy("event_type", "day").agg(kll_sketch_agg(col("v"), 64).as("sk"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kll_sketch_agg"), p)
    // and the blob-merge leg combines map-side too
    val merged = df.groupBy("event_type")
      .agg(graft.functions.KllSketch.kll_merge_agg(col("sk")))
    val pm = merged.queryExecution.executedPlan.toString
    assert(pm.contains("partial_kll_merge_agg"), pm)
  }

  test("events_kll_range daily sketch table persists: second call loads, not rebuilds") {
    val root = java.nio.file.Files.createTempDirectory("graft-kll-store").toString
    spark.conf.set(graft.ops.IndexStore.RootConf, root)
    try {
      val b0 = graft.ops.IndexStore.builds.get()
      val r1 = graft.ops.Sessions.eventsKllRange(spark, sf).collect()
      assert(r1.nonEmpty && r1.forall(_.getBoolean(4)), "range gate failed")
      assert(graft.ops.IndexStore.builds.get() == b0 + 1,
        "cold call must write exactly one sketch-table artifact")
      val r2 = graft.ops.Sessions.eventsKllRange(spark, sf).collect()
      assert(graft.ops.IndexStore.builds.get() == b0 + 1,
        "warm call rebuilt the sketch table instead of loading it")
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        "warm load diverged from the cold build")
    } finally spark.conf.unset(graft.ops.IndexStore.RootConf)
  }

  test("DataFrame build/merge/read: daily sketch table answers the merged quantile") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 40000).map { i =>
      (s"d${i % 9}", rnd.nextDouble() * (1 + i % 9))
    }
    val df = rows.toDF("day", "v")
    val daily = df.groupBy("day").agg(kll_sketch_agg(col("v"), 256).as("sk"))
    assert(daily.count() == 9)
    val got = daily.agg(kll_merge_agg(col("sk")).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5)).as("p50"),
        kll_quantile(col("sk"), lit(0.95)).as("p95")).head()
    val all = rows.map(_._2).sorted.toArray
    def gate(v: Double, q: Double): Unit = {
      val (lo, hi) = rankOf(all, v)
      assert(lo - graft.ops.Sessions.KllRankTol <= q &&
        hi + graft.ops.Sessions.KllRankTol >= q, s"q=$q v=$v ranks ($lo,$hi]")
    }
    gate(got.getDouble(0), 0.5)
    gate(got.getDouble(1), 0.95)
  }
}
