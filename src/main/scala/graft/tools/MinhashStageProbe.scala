package graft.tools
object MinhashStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "mh-probe")
    val sf = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] warm: ${runs.map(r => f"$r%.2f").mkString(", ")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    t("dedup_minhash")(noop(graft.ops.Dedup.dedupMinhash(spark, sf)))
    t("dedup_ngram")(noop(graft.ops.Dedup.dedupNgram(spark, sf)))
    t("corpus_clean")(noop(graft.ops.Dedup.corpusClean(spark, sf)))
    t("doc_fingerprint")(noop(graft.ops.TextAnalysis.docFingerprint(spark, sf)))
    t("text_analysis")(noop(graft.ops.TextAnalysis.textAnalysis(spark, sf)))
    spark.stop()
  }
}
