package graft

import graft.ops.{Dedup, Similarity}

/** The conf-exposed dedup/ANN dials (r19): defaults must reproduce the
  * constants the oracles replay bit-for-bit, and a changed conf must
  * actually reach the stage it claims to tune. */
class DialsSpec extends SparkSpec {

  test("cosine-threshold conf reaches dedup_embedding's verification stage") {
    val defaults = Dedup.dedupEmbedding(spark, sf).count()
    assert(defaults > 0, "fixture should contain embedding near-dups under the default bar")
    spark.conf.set(Dedup.CosineThresholdConf, "1.01")
    try {
      assert(Dedup.dedupEmbedding(spark, sf).count() == 0,
        "an unreachable threshold must drop every candidate pair")
    } finally spark.conf.unset(Dedup.CosineThresholdConf)
  }

  test("cosine-threshold conf reaches dedup_semantic's within-cluster sweep") {
    val defaults = Similarity.dedupSemantic(spark, sf).collect()
    assert(defaults.exists(!_.getBoolean(3)), "fixture should mark some semantic dups")
    spark.conf.set(Dedup.CosineThresholdConf, "1.01")
    try {
      val all = Similarity.dedupSemantic(spark, sf).collect()
      assert(all.forall(_.getBoolean(3)),
        "an unreachable threshold must keep every vector")
    } finally spark.conf.unset(Dedup.CosineThresholdConf)
  }

  test("shortlist frac/cap confs reach the budget arithmetic; defaults reproduce the constants") {
    // defaults = the constants the oracles replay
    assert(Similarity.shortlistFor(spark, 1000L) ==
      math.min(math.ceil(1000 * Similarity.PqShortlistFrac),
        Similarity.PqShortlistMax.toDouble).toInt)
    assert(Similarity.ivfPqShortlist(spark, 1000L) == Similarity.ivfPqShortlist(1000L))
    spark.conf.set(Similarity.ShortlistFracConf, "0.5")
    spark.conf.set(Similarity.ShortlistCapConf, "10")
    try {
      assert(Similarity.shortlistFor(spark, 6L) == 3)   // ceil(0.5·6), under cap
      assert(Similarity.shortlistFor(spark, 1000L) == 10) // cap binds
      assert(Similarity.ivfPqShortlist(spark, 1000000L) ==
        math.max(Similarity.K, 10)) // cap binds the composite budget too
    } finally {
      spark.conf.unset(Similarity.ShortlistFracConf)
      spark.conf.unset(Similarity.ShortlistCapConf)
    }
  }

  test("probe-fraction conf reaches the IVF probe budget; default reproduces the constant") {
    assert(Similarity.ivfProbes(spark, 16) == Similarity.ivfProbes(16))
    spark.conf.set(Similarity.ProbeFracConf, "0.25")
    try {
      assert(Similarity.ivfProbes(spark, 16) == 4)   // ceil(0.25·16)
      assert(Similarity.ivfProbes(spark, 1) == 1)    // floor of one probe
    } finally spark.conf.unset(Similarity.ProbeFracConf)
  }

  test("the bucket cap dial reaches pairGraphExtend (extend ≡ rebuild under any dial)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // base store: 3 docs in one (band,sig) bucket; delta: 2 more into
    // the same bucket → union width 5
    val base = Seq((1L, 0, "sig"), (2L, 0, "sig"), (3L, 0, "sig"))
      .toDF("doc_id", "band", "sig")
    val deltaStore = Seq((4L, 0, "sig"), (5L, 0, "sig")).toDF("doc_id", "band", "sig")
    // probe the candidate stage via the same width rule the method uses
    def extendCandidates(): Long = {
      val full = base.unionByName(deltaStore)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "sig")
      val kept = full.withColumn("bucket_n", count(lit(1)).over(w))
        .filter(col("bucket_n") <= graft.ops.Dedup.bucketCap(spark))
      deltaStore.select(col("doc_id").as("d_id"), col("band"), col("sig"))
        .join(kept, Seq("band", "sig"))
        .filter(col("doc_id") =!= col("d_id")).count()
    }
    assert(extendCandidates() > 0, "default cap keeps the 5-wide bucket")
    spark.conf.set(graft.ops.Dedup.BucketCapConf, "4")
    try assert(extendCandidates() == 0,
      "extend must drop the over-cap bucket under the dialed cap, like a rebuild")
    finally spark.conf.unset(graft.ops.Dedup.BucketCapConf)
  }

  test("probe-fraction dial reaches the IVFADC shortlist budget consistently") {
    assert(Similarity.ivfPqShortlist(spark, 1000000L) == Similarity.ivfPqShortlist(1000000L))
    spark.conf.set(Similarity.ProbeFracConf, "0.05")
    try {
      // the shortlist is a fraction OF THE PROBED POOL: dialing the
      // probe fraction down must shrink the budget with it
      val dialed = Similarity.ivfPqShortlist(spark, 1000000L)
      assert(dialed == math.max(Similarity.K,
        math.ceil(1000000L * 0.05 * Similarity.PqShortlistFrac).toInt))
      assert(dialed < Similarity.ivfPqShortlist(1000000L))
    } finally spark.conf.unset(Similarity.ProbeFracConf)
  }

  test("dial misconfiguration fails loudly, not silently") {
    spark.conf.set(Similarity.ShortlistFracConf, "1.5")
    try intercept[IllegalArgumentException](Similarity.shortlistFor(spark, 10L))
    finally spark.conf.unset(Similarity.ShortlistFracConf)
    spark.conf.set(Dedup.BucketCapConf, "1")
    try intercept[IllegalArgumentException](Dedup.bucketCap(spark))
    finally spark.conf.unset(Dedup.BucketCapConf)
    spark.conf.set(Dedup.CosineThresholdConf, "0")
    try intercept[IllegalArgumentException](Dedup.cosineThreshold(spark))
    finally spark.conf.unset(Dedup.CosineThresholdConf)
  }
}
