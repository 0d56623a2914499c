package graft.tools

import graft.ops.Pipeline
import graft.sources.FixedWidth
import org.apache.spark.sql.SparkSession

/** Render the lineitem fixture to fixed-width text files — produces the
  * input the reference's CLI consumes, for CLI demos and the throughput
  * bench. `runMain graft.tools.RenderFixture <sfDir> <outDir> [copies]`
  * (copies > 1 unions the data N times to build a large corpus). */
object RenderFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val copies = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Pipeline.lineitem(spark, sfDir)
    val big = Iterator.fill(copies)(li).reduce(_ union _)
    FixedWidth.write(big, Pipeline.lineitemFixed, outDir)
    println(s"rendered ${li.count() * copies} lines -> $outDir")
    spark.stop()
  }
}
