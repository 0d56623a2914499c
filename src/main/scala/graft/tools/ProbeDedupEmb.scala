package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev probe (round 13): attributes the dedup_embedding creep
  * (r8 1.31 s -> r12 2.56 s median at identical plan shape).
  *
  * Modes (args): "fresh" (default) times dedup_embedding in a fresh
  * session; "stages" splits the query into normed-scan / signature
  * projection / banded candidates / full query legs so the creep lands
  * on a named stage; "splits" prints the embeddings scan's partition
  * count (the single-split suspicion). Not engine surface; tools/ only.
  */
object ProbeDedupEmb {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def runs(label: String, n: Int)(f: => Unit): Unit = {
    System.gc(); Thread.sleep(200)
    val xs = Seq.fill(n) { System.gc(); Thread.sleep(100); t(f) }
    println(f"[probe] $label: min=${xs.min}%.3f med=${xs.sorted.apply(n / 2)}%.3f " +
      xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "probe-dedup-emb")
    spark.sparkContext.setLogLevel("ERROR")
    val mode = if (args.isEmpty) "fresh" else args(0)

    if (mode == "splits") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      println(s"[probe] embeddings scan splits: ${emb.rdd.getNumPartitions}" +
        s" defaultParallelism=${spark.sparkContext.defaultParallelism}")
    }

    if (mode == "stages") {
      // Reconstruct the query's internals (same shapes as Dedup).
      val n = spark.read.parquet(s"$sfDir/embeddings.parquet").select(col("vec_id"),
          transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
        .withColumn("nrm", graft.functions.VectorOps.vec_norm(col("v")))
      val bands = graft.functions.VectorOps.vec_lsh_bands(col("v"),
        graft.ops.Dedup.hyperplanes, graft.ops.Dedup.HyperRows)
      val banded = n.select(col("vec_id"), posexplode(bands).as(Seq("band", "sig")))
      val bandedCount = banded.select(count(lit(1)))
      val nf = graft.ops.Similarity.fanOut(spark, sfDir, "embeddings", n, col("vec_id"))
      val bandedF = nf.select(col("vec_id"), posexplode(bands).as(Seq("band", "sig")))
      val bandedFCount = bandedF.select(count(lit(1)))
      val cands = graft.ops.Dedup.bandedCandidates(bandedF, "vec_id")
      val candsCount = cands.select(count(lit(1)))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "sig")
      val kept = bandedF.withColumn("bucket_n", count(lit(1)).over(w))
        .filter(col("bucket_n") <= graft.ops.Dedup.MaxBucketWidth)
      val keptCount = kept.select(count(lit(1)))
      val rawPairs = kept.as("x").join(kept.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      val rawCount = rawPairs.select(count(lit(1)))
      println(s"[probe] counts: banded=${bandedF.count()} raw_pairs=${rawPairs.count()}" +
        s" distinct_pairs=${cands.count()}")
      force(n); runs("normed_only", 5)(force(n))
      force(bandedCount); runs("banded_sigs", 5)(force(bandedCount))
      force(bandedFCount); runs("banded_sigs_fanned", 5)(force(bandedFCount))
      force(keptCount); runs("window_kept", 5)(force(keptCount))
      force(rawCount); runs("raw_pairs", 5)(force(rawCount))
      force(candsCount); runs("candidates", 5)(force(candsCount))
    }

    // Fresh-session timing ONLY in fresh mode: after the splits/stages
    // modes the session is heavily warmed (JIT, page cache, shuffle
    // files), and a figure measured there must not print under the
    // same label as the fresh-session one — the creep attribution this
    // probe exists for depends on those being comparable.
    if (mode == "fresh") {
      val q = graft.ops.Dedup.dedupEmbedding(spark, sfDir)
      force(q) // warmup (codegen)
      runs("dedup_embedding", 5)(force(q))
      if (args.contains("explain")) q.explain("formatted")
    }
    spark.stop()
  }
}
