package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 12): attributes the similarity_topk creep
  * (r8 1.98 s -> r11 4.09 s median at identical plan shape).
  *
  * Modes (args): "fresh" (default) times similarity_topk in a fresh
  * session; "recall-first" replays the bench sweep's alphabetical
  * order (similarity_ann_ivf, similarity_ann_recall, then topk) to
  * price the exactPairsCache / session-state interaction; "stages"
  * splits the query into normed-scan / join+dot / full-topk legs so
  * the creep lands on a named stage. Not engine surface; tools/ only.
  */
object ProbeTopk12 {
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
    val spark = graft.GraftSession.local(32, "probe-topk")
    spark.sparkContext.setLogLevel("ERROR")
    val mode = if (args.isEmpty) "fresh" else args(0)

    if (mode == "recall-first") {
      runs("ann_ivf_once", 1)(force(graft.ops.Similarity.similarityAnnIvf(spark, sfDir)))
      runs("ann_recall_once", 1)(force(graft.ops.Similarity.similarityAnnRecall(spark, sfDir)))
    }

    if (mode == "stages") {
      // Reconstruct the query's internals (same shapes as Similarity).
      val n = spark.read.parquet(s"$sfDir/embeddings.parquet").select(col("vec_id"),
          transform(col("embedding"), x => x.cast(org.apache.spark.sql.types.DoubleType)).as("v"))
        .withColumn("nrm", graft.functions.VectorOps.vec_norm(col("v")))
      val blocks = graft.ops.Similarity.Blocks
      val a = n.select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
        .withColumn("blk", explode(typedLit((0 until blocks).toArray)))
      val b = n.select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("nrm").as("nb"))
        .withColumn("blk", pmod(hash(col("neighbor_id")), lit(blocks)))
      val pairs = a.join(b, "blk").filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          (graft.ops.Dedup.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      val normedOnly = n
      val pairsSum = pairs.agg(sum(col("sim")))
      val topkAgg = pairs.groupBy("query_id")
        .agg(graft.functions.TopK.topk_by_score(col("sim"), col("neighbor_id"), 5).as("nn"))
      force(normedOnly); runs("normed_only", 5)(force(normedOnly))
      force(pairsSum); runs("pairs_sum", 5)(force(pairsSum))
      force(topkAgg); runs("topk_agg_nosort", 5)(force(topkAgg))
    }

    if (mode == "ivf") {
      val ivf = graft.ops.Similarity.similarityAnnIvf(spark, sfDir)
      force(ivf)
      runs("ann_ivf", 5)(force(ivf))
      val rec = graft.ops.Similarity.similarityAnnRecall(spark, sfDir)
      force(rec)
      runs("ann_recall", 5)(force(rec))
    }

    if (mode == "conf") {
      for (thr <- Seq("128", "4096", "1048576")) {
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
        val q = graft.ops.Similarity.similarityTopk(spark, sfDir)
        force(q)
        runs(s"topk_fallback_$thr", 5)(force(q))
      }
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }

    val topk = graft.ops.Similarity.similarityTopk(spark, sfDir)
    force(topk) // warmup (codegen)
    runs("similarity_topk", 5)(force(topk))
    if (args.contains("explain")) topk.explain("formatted")
    spark.stop()
  }
}
