package graft.tools

import org.apache.spark.sql.functions._

// r18: simhash null-drop formulation A/B (Filter-on-alias vs Generate).
object ProbeMh18b {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "mh18b-probe")
    val sf = "/root/testdata/sf0.1"
    import graft.ops.Docs
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] warm: ${runs.map(r => f"$r%.2f").mkString(", ")}")
    }
    val base = Docs.fanned(spark, sf)
      .select(col("doc_id"), Docs.tokens(col("text")).as("toks"))
    val viaFilter = base
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), graft.functions.SimHash.simhash64(col("toks")).as("s"))
      .select(col("doc_id"), col("s.sim_hi"), col("s.sim_lo"))
    val viaGen = base
      .select(col("doc_id"),
        explode(filter(array(graft.functions.SimHash.simhash64(col("toks"))),
          _ => size(col("toks")) > 0)).as("s"))
      .select(col("doc_id"), col("s.sim_hi"), col("s.sim_lo"))
    t("sig_via_filter")(noop(viaFilter))
    t("sig_via_generate")(noop(viaGen))
    t("sig_via_filter2")(noop(viaFilter))
    t("sig_via_generate2")(noop(viaGen))
    spark.stop()
  }
}
