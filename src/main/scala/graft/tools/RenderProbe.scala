package graft.tools

import graft.ops.Pipeline
import graft.parse.{Compat, FixedWidthParser, Strict}
import graft.sources.FixedWidth
import org.apache.spark.sql.functions._

// Attribution probe for the render->parse->sort roundtrip queries.
object RenderProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Pipeline.lineitem(spark, "/root/testdata/sf0.1")
    val rendered = FixedWidth.render(li, Pipeline.lineitemFixed)
    time("warmup") { force(rendered) }
    time("render") { force(rendered) }
    // render without the timestamp column
    val noTs = Pipeline.lineitemFixed.copy(fields = Pipeline.lineitemFixed.fields.init)
    time("render-no-ts") { force(FixedWidth.render(li.drop("l_shipdate"), noTs)) }
    val parsedStrict = FixedWidthParser.parse(rendered, Pipeline.lineitemFixed, Strict)
    time("render+parse") { force(parsedStrict) }
    val zp = FixedWidth.render(li, Pipeline.lineitemFixed, zeroPadNumerics = true)
    time("render+parse-compat") { force(FixedWidthParser.parse(zp, Pipeline.lineitemFixed, Compat)) }
    time("full roundtrip+sort") { force(Pipeline.fixedwidthRoundtrip(spark, "/root/testdata/sf0.1")) }
    spark.stop()
  }
}
