package graft.tools
object CorruptProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "render-probe")
    val sf = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] warm: ${runs.map(r => f"$r%.2f").mkString(", ")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    t("fixedwidth_roundtrip")(noop(graft.ops.Pipeline.fixedwidthRoundtrip(spark, sf)))
    t("fixedwidth_compat")(noop(graft.ops.Pipeline.compatParse(spark, sf)))
    t("alltypes_roundtrip")(noop(graft.ops.AllTypes.alltypesRoundtrip(spark, sf)))
    t("fixedwidth_corrupt")(noop(graft.ops.AllTypes.corruptScan(spark, sf)))
    spark.stop()
  }
}
