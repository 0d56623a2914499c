package graft.tools

import graft.ops.Pipeline
import graft.parse.{Compat, FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame

/** Dev probe: where does fixedwidth_compat's time go — regex guards,
  * parse, render, or sort scaffolding? */
object ProbeCompat {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def runs(label: String)(f: => Unit): Unit = {
    System.gc(); Thread.sleep(200)
    val xs = Seq.fill(3)(t(f))
    println(f"[probe] $label: " + xs.map(x => f"$x%.3f").mkString(" "))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-compat")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val rendered = graft.ops.Pipeline.lineitem(spark, sf)
      .transform(df => graft.sources.FixedWidth.render(df, Pipeline.lineitemFixed, zeroPadNumerics = true))
      .repartition(32)
    rendered.cache().count()
    val compat = FixedWidthParser.parse(rendered, Pipeline.lineitemFixed, Compat, dropFooter = false)
    val strict = FixedWidthParser.parse(rendered, Pipeline.lineitemFixed, Strict, dropFooter = false)
    force(compat); force(strict)
    runs("compat_parse")(force(compat))
    runs("strict_parse")(force(strict))
    runs("compat_sorted")(force(compat.orderBy("l_orderkey", "l_linenumber", "l_partkey")))
    runs("full_query")(force(Pipeline.compatParse(spark, sf)))
    spark.stop()
  }
}
