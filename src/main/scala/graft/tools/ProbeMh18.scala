package graft.tools

// r18 minhash regression bisect: stage-by-stage timing of the LSH
// cascade at sf0.1, fused signature vs the pre-r18 aggregate chain.
object ProbeMh18 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "mh18-probe")
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
    t("shingled")(noop(sh))
    t("sigs_fused")(noop(Dedup.minhashSigs(sh)))
    t("sigs_agg")(noop(Dedup.minhashSigsAgg(sh)))
    t("bands_fused")(noop(Dedup.bandSigs(Dedup.minhashSigs(sh))))
    t("dedup_minhash")(noop(Dedup.dedupMinhash(spark, sf)))
    t("pairGraphOver")(noop(Dedup.pairGraphOver(sh)))
    spark.stop()
  }
}
