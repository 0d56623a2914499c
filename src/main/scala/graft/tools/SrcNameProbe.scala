package graft.tools

import graft.ops.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does input_file_name() match the manifest's qualified file
  * names byte-for-byte? Sizes the delete rewrite's source-index map. */
object SrcNameProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("srcname-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("srcprobe").toString
    val rows = (0L until 40L).map(i => (i, if (i < 30) Some(i % 5) else None))
      .toDF("event_id", "user_id")
    Layout.zorderWrite(spark, rows, dir, Seq("user_id"), nFiles = 4)
    val mfNames = Layout.loadManifest(spark, dir)
      .select("file").distinct().collect().map(_.getString(0)).sorted
    println("manifest: " + mfNames.head)
    val seen = spark.read.parquet(mfNames.toIndexedSeq: _*)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).sorted
    println("inputfn:  " + seen.head)
    println("match: " + (mfNames.toSet == seen.toSet))
    spark.stop()
  }
}
