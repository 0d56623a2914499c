package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** r17 scale-adaptive cluster geometry: the centroid count k is
  * DERIVED from corpus size (cellsFor), so the within-cluster stages
  * (SemDeDup pair sweep, IVF probed rerank) keep E[cluster size] at
  * TargetClusterSize instead of growing linearly with the corpus, and
  * the seed selection is one partial-agg `min_by` pass rather than a
  * full-corpus window sort at k-way parallelism. */
class ClusterGeometrySpec extends SparkSpec {

  test("cellsFor law: E[cluster size] bounded by TargetClusterSize below the MaxCells clamp") {
    val T = Similarity.TargetClusterSize
    // In the unclamped regime (MinCells·T <= N <= MaxCells·T) the law
    // guarantees N/k <= T — per-cluster pair work is bounded by T² in
    // expectation AT ANY CORPUS SIZE, the property fixed k=16 lacked.
    for (n <- Seq(Similarity.MinCells.toLong * T, 2000L, 100000L,
        1L << 20, Similarity.MaxCells.toLong * T)) {
      val k = Similarity.cellsFor(n)
      assert(n.toDouble / k <= T.toDouble + 1e-9, s"n=$n k=$k: avg cluster ${n.toDouble / k}")
      assert(k >= Similarity.MinCells && k <= Similarity.MaxCells)
    }
    // Clamps: tiny corpora keep MinCells inhabitable residue classes;
    // past MaxCells·T the k·dim centroid literal stops being
    // plan-metadata scale — the documented hand-off to a real ANN index.
    assert(Similarity.cellsFor(1L) == Similarity.MinCells)
    assert(Similarity.cellsFor(Similarity.MaxCells.toLong * T * 1000) == Similarity.MaxCells)
    // Monotone in N (no oscillation a snapshot refresh could flip on).
    val ks = Seq(16L, 500L, 2000L, 10000L, 1000000L, 1L << 40).map(Similarity.cellsFor)
    assert(ks == ks.sorted)
    // The fixture geometry the r15/r16 recall measurements were taken
    // at is preserved where it applied: k(500) = 16, nProbe(16) = 12.
    assert(Similarity.cellsFor(500) == 16)
    assert(Similarity.ivfProbes(16) == 12)
    // And k now VARIES across the fixture scale factors (sf0.1 = 2000
    // vectors), which the oracle SQL derives identically from count(*).
    assert(Similarity.cellsFor(2000) == 63)
    assert(Similarity.ivfProbes(63) == 48)
  }

  test("min_by seed selection == min-vec_id-per-residue-class (the window formulation's contract)") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val k = Similarity.cellsFor(vecs.length)
    val expected = vecs.groupBy(_._1 % k).map { case (cls, vs) =>
      cls -> vs.minBy(_._1)._2
    }
    val seeds = Similarity.seedPivotsFor(spark, sf)
    assert(seeds.length == expected.size)
    seeds.foreach { case (cls, v, nrm) =>
      val e = expected(cls)
      assert(v.sameElements(e), s"seed vector for class $cls")
      assert(math.abs(nrm - math.sqrt(e.map(x => x * x).sum)) < 1e-12)
    }
    // classes sorted, unique — the contract every centroid-literal
    // consumer (assignment, probes, streaming dual) relies on
    assert(seeds.map(_._1).toSeq == seeds.map(_._1).toSeq.sorted)
  }

  test("seed-selection shape is a partial aggregate, not a window sort") {
    // The exact shape seedPivots plans: min_by per residue class. The
    // r16 formulation (row_number over a k-partition window) sorted
    // the FULL corpus at k-way parallelism to pick k rows; min_by
    // reduces map-side to k buffers per task with no sort at all.
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("cls", col("vec_id") % 16)
      .groupBy("cls").agg(min_by(struct(col("v")), col("vec_id")).as("s"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    // min_by over a struct buffer plans as SortAggregate (struct
    // buffers aren't hash-aggregable) — what matters for scale is the
    // PARTIAL leg: each task locally sorts its slice by the 8-byte
    // class key and reduces to k buffers BEFORE the exchange, so only
    // k rows per task move — vs the window formulation shuffling the
    // full corpus to k partitions and sorting it there.
    assert(p.contains("partial_min_by"), p)
  }

  test("CentroidSims == the per-cell dot/nullif composition, cell by cell") {
    import graft.functions.VectorOps
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(64)
    val seeds = Similarity.seedPivotsFor(spark, sf)
    val centroids = seeds.map(_._2)
    val norms = seeds.map(_._3)
    val n = vecs.withColumn("nrm", VectorOps.vec_norm(col("v")))
    val one = seeds.indices.map(j =>
      (VectorOps.vec_dot(col("v"), typedLit(centroids(j).toSeq)) /
        nullif(col("nrm") * lit(norms(j)), lit(0.0))).as(s"c$j"))
    val composed = n.select(col("vec_id") +: one: _*).collect()
      .map(r => r.getLong(0) -> seeds.indices.map(j =>
        if (r.isNullAt(j + 1)) null else r.getDouble(j + 1))).toMap
    val fused = n.select(col("vec_id"),
        VectorOps.vec_centroid_sims(col("v"), col("nrm"), centroids, norms).as("sims"))
      .collect()
    fused.foreach { r =>
      val got = r.getSeq[Any](1)
      assert(got == composed(r.getLong(0)), s"vec ${r.getLong(0)}")
    }
    // corruption convention: wrong dimension → null result, zero norm
    // product → null cell
    val bad = spark.range(1).select(
      VectorOps.vec_centroid_sims(typedLit(Seq(1.0, 2.0)), lit(1.0),
        centroids, norms).as("s")).head()
    assert(bad.isNullAt(0), "dimension mismatch must null out")
    val zeroN = spark.range(1).select(
      VectorOps.vec_centroid_sims(typedLit(centroids(0).toSeq), lit(0.0),
        centroids, norms).as("s")).head().getSeq[Any](0)
    assert(zeroN.forall(_ == null), "zero query norm nulls every cell")
  }

  test("assignment stage stays inside whole-stage codegen at derived k") {
    // The r17 regression this pins: at k=63 the per-centroid expression
    // composition blew past codegen limits and the WHOLE stage ran
    // interpreted (no *(n) spans anywhere in the plan; 0.33 → 1.63 s).
    // CentroidSims keeps generated code constant-size in k.
    val df = Similarity.embeddingCluster(spark, "/root/testdata/sf0.1")
    df.collect() // AQE renders *(n) spans only once the plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("),
      s"no WholeStageCodegen span in embedding_cluster's plan:\n${plan.take(800)}")
  }

  test("two-level argmax with exhaustive probes ≡ the flat rule, row for row") {
    // r18: past TwoLevelMinCells assignment switches to the coarse-
    // quantized scan. With probeGroups >= numGroups the probe set is
    // every group, so the scan must reproduce the flat argmax EXACTLY
    // (same dot loop, same ascending-index strict-> tie-break) — the
    // identity this test pins on the real fixture vectors.
    import graft.functions.VectorOps
    val seeds = Similarity.seedPivotsFor(spark, sf)
    val centroids = seeds.map(_._2)
    val norms = seeds.map(_._3)
    val gs = Similarity.twoLevelGroupSize(seeds.length)
    val numGroups = (seeds.length + gs - 1) / gs
    val n = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", VectorOps.vec_norm(col("v")))
    val flat = n.select(col("vec_id"),
        VectorOps.vec_centroid_sims(col("v"), col("nrm"), centroids, norms).as("sims"))
      .withColumn("pos", expr("array_position(sims, array_max(sims))"))
      .select(col("vec_id"), col("pos"),
        element_at(col("sims"), col("pos").cast("int")).as("sim"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val two = n.select(col("vec_id"),
        VectorOps.centroid_argmax_two_level(col("v"), col("nrm"),
          centroids, norms, gs, numGroups).as("a"))
      .select(col("vec_id"), col("a.pos"), col("a.sim")).collect()
    assert(two.length == flat.size)
    two.foreach { r =>
      val (ePos, eSim) = flat(r.getLong(0))
      assert(r.getInt(1).toLong == ePos, s"vec ${r.getLong(0)}: pos")
      assert(r.getDouble(2) == eSim, s"vec ${r.getLong(0)}: sim must be bit-identical")
    }
  }

  test("two-level assignment end-to-end past the threshold (structured centroids)") {
    // Exercises the REAL route selection: clusterAssignment over >=
    // TwoLevelMinCells seeds plans the two-level expression, and on
    // centroids with coarse structure the default probe dial recovers
    // the exact assignment. Construction: centroid j = e_{j/gs} +
    // 0.5·e_{j mod gs} at dim = gs — group g's coarse mean points at
    // e_g, so a query equal to centroid j ranks group j/gs first and
    // the in-group exact scan finds j (sim 1.0).
    val spark2 = spark
    import spark2.implicits._
    val k = Similarity.TwoLevelMinCells // 4096: the smallest two-level k
    val gs = Similarity.twoLevelGroupSize(k)
    assert(gs * gs == k, "fixture geometry: k must be a perfect square here")
    def centroid(j: Int): Array[Double] = {
      val v = new Array[Double](gs)
      v(j / gs) += 1.0
      v(j % gs) += 0.5
      v
    }
    val seeds: Array[(Long, Array[Double], Double)] = Array.tabulate(k) { j =>
      val v = centroid(j)
      (j.toLong, v, math.sqrt(v.map(x => x * x).sum))
    }
    val queryIds = Seq(0, 1, gs - 1, gs, 17 * gs + 3, k - 1)
    val n = queryIds.map(j => (j.toLong, centroid(j).toSeq)).toDF("vec_id", "v")
      .withColumn("nrm", graft.functions.VectorOps.vec_norm(col("v")))
    val asg = Similarity.clusterAssignment(n, seeds).collect()
    assert(asg.length == queryIds.length)
    asg.foreach { r =>
      assert(r.getLong(1) == r.getLong(0),
        s"query ${r.getLong(0)} must land in its own cell, got ${r.getLong(1)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"self-sim must be 1.0")
    }
  }

  test("two-level cost law: probed centroids stay O(√k), not O(k)") {
    // Pure arithmetic of the dials: at the MaxCells clamp the flat
    // scan is k = 131072 centroid dots per vector; the two-level scan
    // is numGroups coarse dots + probeGroups·groupSize fine dots.
    for (k <- Seq(Similarity.TwoLevelMinCells, 1 << 15, Similarity.MaxCells)) {
      val gs = Similarity.twoLevelGroupSize(k)
      val numGroups = (k + gs - 1) / gs
      val scanned = numGroups + Similarity.TwoLevelProbeGroups * gs
      // scanned = numGroups + w·groupSize ≈ (1+w)·√k — the O(√k) law
      assert(scanned.toDouble <=
          (Similarity.TwoLevelProbeGroups + 2) * math.sqrt(k.toDouble),
        s"k=$k: scanned $scanned exceeds the (1+w)·√k law")
      // and the flat path is never planned at this k
      assert(k >= Similarity.TwoLevelMinCells)
    }
    // At the MaxCells clamp the saving is ~40×: the 8.4M-mult flat scan
    // the r17 verdict flagged shrinks to a ~2.5% guided exact scan.
    val gsMax = Similarity.twoLevelGroupSize(Similarity.MaxCells)
    val scannedMax = (Similarity.MaxCells + gsMax - 1) / gsMax +
      Similarity.TwoLevelProbeGroups * gsMax
    assert(scannedMax.toDouble / Similarity.MaxCells <= 0.03,
      s"clamp-scale ratio ${scannedMax.toDouble / Similarity.MaxCells}")
  }

  test("oversized cells split: sweep-group sizes bounded on a degenerate hot cluster") {
    import spark.implicits._
    // Synthetic oversized fixture: 19 orthogonal seed directions (one
    // per residue class of the derived k = ceil(608/32) = 19), then
    // 589 IDENTICAL copies of seed 0's direction — every copy assigns
    // to cell 0, a 590-member degenerate cluster (> SemSplitBound=256)
    // that a similarity re-seed provably cannot split (all cosines
    // tie). The residue sub-split must bound the sweep groups anyway.
    val dim = 21
    def unit(axis: Int): Seq[Float] =
      (0 until dim).map(i => if (i == axis) 1.0f else 0.0f)
    val n = 608
    val rows = (0L until n.toLong).map { id =>
      if (id < 19L) (id, unit((id % 19L).toInt + 2))
      else (id, unit(0))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-hotcell").toString
    rows.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")

    val out = Similarity.dedupSemantic(spark, dir).collect()
    assert(out.length == n)

    // Replay the contract on the driver: residue sub-split of the one
    // oversized cell, min-id linking within (cluster, sub).
    val byCluster = out.groupBy(_.getLong(1))
    val hot = byCluster.maxBy(_._2.length)
    assert(hot._2.length == 590, s"expected the 590-member hot cell, got ${hot._2.length}")
    val sk = math.ceil(590.0 / Similarity.TargetClusterSize).toLong // 19
    // sweep groups: (cluster, vec_id % sk) — all bounded near Target
    val groups = hot._2.groupBy(r => r.getLong(0) % sk)
    assert(groups.values.map(_.length).max <= Similarity.TargetClusterSize + 2,
      s"sub-split left an oversized sweep group: ${groups.values.map(_.length).max}")
    // contract replay with the true geometry: cosines here are exactly
    // 1 (same axis) or 0 (different axis), so dup_of(id) = the minimum
    // EARLIER same-axis member of id's sub-group (id 0 rides in the
    // hot cell but points along a different axis than the 589 copies).
    def axis(id: Long): Int = if (id < 19L) (id % 19L).toInt + 2 else 0
    for ((_, members) <- groups) {
      val ids = members.map(_.getLong(0)).sorted
      for (r <- members) {
        val (id, dupOf, kept) = (r.getLong(0),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))
        val want = ids.filter(j => j < id && axis(j) == axis(id)).headOption
        assert(dupOf == want && kept == want.isEmpty,
          s"$id: expected dup_of=$want, got $dupOf (kept=$kept)")
      }
    }
    // the 18 orthogonal singletons are kept, untouched by the split
    val singles = out.filter(r => r.getLong(0) >= 1L && r.getLong(0) <= 18L)
    assert(singles.length == 18 && singles.forall(_.getBoolean(3)))

    // plan pin ON THE HOT FIXTURE: with an over-bound cell present the
    // pair join must key on (cluster_id, sub_id) — the sub key IS the
    // pair-work bound. (On the fixture corpora subK is empty and the
    // optimizer folds lit(0)=lit(0) away entirely — the no-op split
    // costs zero, which the below-bound identity test pins.)
    val plan = Similarity.dedupSemantic(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in dedup_semantic:\n$plan")
    val joinLine = plan.linesIterator.find(l =>
      l.contains("HashJoin") && l.contains("cluster_id")).getOrElse("")
    assert(joinLine.contains("sub_id"), s"pair join does not key on sub_id:\n$plan")
  }

  test("sub-split is the identity below the bound (fixture corpora untouched)") {
    val asg = Similarity.dedupSemantic(spark, sf).collect()
    // oracle-checked values aside, pin the structural claim: no
    // fixture cell exceeds the bound, so sub_id was 0 everywhere and
    // the pre-r19 pair rule is what ran (max observed width 42).
    val widths = asg.groupBy(_.getLong(1)).map(_._2.length)
    assert(widths.max <= Similarity.SemSplitBound,
      s"fixture grew an oversized cell (${widths.max}) — revisit the no-op claim")
  }

  test("measured cluster sizes on the fixtures track the law's expectation") {
    for (dir <- Seq(sf, "/root/testdata/sf0.1")) {
      val asg = Similarity.embeddingCluster(spark, dir)
      val n = asg.count()
      val k = Similarity.cellsFor(n)
      val sizes = asg.groupBy("cluster_id").count().collect().map(_.getLong(1))
      // avg cluster size == N / inhabited-clusters <= N/k rounded up;
      // the law keeps N/k <= TargetClusterSize
      assert(n.toDouble / k <= Similarity.TargetClusterSize.toDouble + 1e-9)
      assert(sizes.sum == n)
      // residue-class seeding is near-uniform on these fixtures: no
      // cluster should exceed a small multiple of the target (guards a
      // degenerate all-in-one-cell assignment, which would resurrect
      // the quadratic stage the law exists to kill)
      assert(sizes.max <= 8L * Similarity.TargetClusterSize,
        s"$dir: max cluster ${sizes.max}")
    }
  }
}
