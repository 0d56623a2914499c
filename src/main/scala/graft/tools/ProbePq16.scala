package graft.tools

/** r16: similarity_pq_topk priced ~12 s at bench config vs r15's
  * 1.86 s record — bisect which stage regressed after the LUT-ADC
  * rewrite. Times codebook build, encode, LUT path, recon path, and
  * the ADC candidate stage alone (no rerank).
  *   runMain graft.tools.ProbePq16 /root/testdata/sf0.1
  */
object ProbePq16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "probe-pq16")
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      graft.Bench.gcBarrier()
      val t0 = System.nanoTime()
      f
      println(f"PQ16 $label%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("codebook")(graft.ops.Similarity.pqCodebook(spark, dir))
    t("codebook2")(graft.ops.Similarity.pqCodebook(spark, dir))
    (1 to 2).foreach { i =>
      t(s"encode$i")(graft.ops.Similarity.embeddingPq(spark, dir)
        .write.format("noop").mode("overwrite").save())
      t(s"adc_lut$i")(graft.ops.Similarity.pqAdcStage(spark, dir, lutScoring = true)
        .write.format("noop").mode("overwrite").save())
      t(s"adc_recon$i")(graft.ops.Similarity.pqAdcStage(spark, dir, lutScoring = false)
        .write.format("noop").mode("overwrite").save())
      t(s"lut$i")(graft.ops.Similarity.similarityPqTopk(spark, dir)
        .write.format("noop").mode("overwrite").save())
      t(s"recon$i")(graft.ops.Similarity.similarityPqTopkRecon(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
