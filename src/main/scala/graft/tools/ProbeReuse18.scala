package graft.tools

import org.apache.spark.sql.functions._

// r18: does the CollectMetrics (observe) node block runtime exchange
// reuse across the banded candidate self-join? A/B with and without.
object ProbeReuse18 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "reuse18")
    val sf = "/root/testdata/sf0.1"
    import graft.ops.{Dedup, Docs}
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] warm: ${runs.map(r => f"$r%.2f").mkString(", ")}")
    }
    val sh = Docs.shingled(Docs.fanned(spark, sf))
    val banded = Dedup.bandSigs(Dedup.minhashSigs(sh))
    // With the production observe+window shape:
    t("cands_prod")(noop(Dedup.bandedCandidates(banded, "doc_id")))
    // Same shape, no observe:
    def candsNoObserve(b: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "sig")
      val kept = b.withColumn("bucket_n", count(lit(1)).over(w))
        .filter(col("bucket_n") <= Dedup.MaxBucketWidth)
      kept.as("x").join(kept.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .dropDuplicates("a", "b")
    }
    t("cands_no_observe")(noop(candsNoObserve(banded)))
    // Bucket-grouped: no self-join at all.
    def candsGrouped(b: org.apache.spark.sql.DataFrame) = {
      val g = b.groupBy("band", "sig")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) <= Dedup.MaxBucketWidth)
      g.select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a"), explode(col("ids")).as("b"))
        .filter(col("a") < col("b"))
        .dropDuplicates("a", "b")
    }
    t("cands_grouped")(noop(candsGrouped(banded)))
    spark.stop()
  }
}
