package graft.tools
import org.apache.spark.sql.functions._
import graft.ops.Pipeline
import graft.sources.FixedWidth
import graft.parse.FixedWidthParser
object CorruptProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "corrupt-probe")
    val sf = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] warm: ${runs.map(r => f"$r%.2f").mkString(", ")}")
    }
    val li = Pipeline.lineitem(spark, sf)
    val value = FixedWidth.renderValue(Pipeline.lineitemFixed)
    def broken = li.select(
      when(col("l_linenumber") === 7, substring(value, 1, 20)).otherwise(value).as("value"))
      .repartition(spark.sparkContext.defaultParallelism)
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    t("dropFooter_true")(noop(FixedWidthParser.parse(broken, Pipeline.lineitemFixed)))
    t("dropFooter_false")(noop(FixedWidthParser.parse(broken, Pipeline.lineitemFixed,
      dropFooter = false)))
    spark.stop()
  }
}
