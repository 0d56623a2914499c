package graft.tools

import graft.ops.{Layout, Sessions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: per-dimension kept/total file counts on the 3-dim z layout
  * at fixture scale — sizes the GraftZSpec pruning assertions. */
object Z3Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .appName("z3-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val src = Sessions.events(spark, dir)
      .withColumn("day_idx", Layout.dayIdx)
      .withColumn("hour_idx", hour(col("ts")))
    val path = java.nio.file.Files.createTempDirectory("z3probe").toString
    Layout.zorderWrite(spark, src, path, Layout.Z3Dims, nFiles = 16)
    def kept(bounds: Seq[(String, Long, Long)]): (Int, Int) = {
      val (_, k, t) = Layout.zorderPrunedScanBox(spark, path, bounds)
      (k.length, t)
    }
    println("user eq0:  " + kept(Seq(("user_id", 0L, 0L))))
    println("user box:  " + kept(Seq(("user_id", Layout.ZUserLo, Layout.ZUserHi))))
    println("day box:   " + kept(Seq(("day_idx", Layout.ZDayLo.toLong, Layout.ZDayHi.toLong))))
    println("hour eq0:  " + kept(Seq(("hour_idx", 0L, 0L))))
    println("hour box:  " + kept(Seq(("hour_idx", Layout.ZHourLo.toLong, Layout.ZHourHi.toLong))))
    println("full box:  " + kept(Seq(
      ("user_id", Layout.ZUserLo, Layout.ZUserHi),
      ("day_idx", Layout.ZDayLo.toLong, Layout.ZDayHi.toLong),
      ("hour_idx", Layout.ZHourLo.toLong, Layout.ZHourHi.toLong))))
    spark.stop()
  }
}
