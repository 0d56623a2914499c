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
