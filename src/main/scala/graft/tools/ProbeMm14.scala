package graft.tools

import graft.ops.{Docs, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r14): re-price the multimodal fan-out with the REAL
  * ImageIO codec. r13's stub measured +58% when fanned (the exchange
  * cost more than a no-op decode); the real encode+decode should
  * invert that. Times multimodal_features and multimodal_resize with
  * the production (fanned) staging vs an unfanned twin. Not engine
  * surface; tools/ only. */
object ProbeMm14 {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** [[Multimodal.media]] minus the fan-out: the SAME staging body
    * (`Multimodal.mediaOver`) over the raw single-split scan, so the
    * A/B twin cannot drift from production. */
  private def mediaUnfanned(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaOver(Docs.documents(spark, dir))

  private def featuresOver(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new Multimodal.ImageCodec
        rows.map { case (id, png) =>
          val d = codec.decode(png)
          (id, d.gray.map(_.toLong).sum.toDouble / d.gray.length)
        }
      }.toDF("media_id", "f_mean")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-mm14")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def leg(tag: String, df: => DataFrame): Unit = {
      force(df) // codegen/JIT warmup
      val runs = Seq.fill(3)(t(force(df)))
      println(f"[probe] $tag: min=${runs.min}%.3f " +
        runs.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    leg("features fanned  ", Multimodal.multimodalFeatures(spark, dir))
    leg("features unfanned", featuresOver(mediaUnfanned(spark, dir)))
    leg("features fan-mini", featuresOver(Multimodal.media(spark, dir)))
    leg("resize   fanned  ", Multimodal.multimodalResize(spark, dir))
    println(s"[probe] splits: fanned=${Multimodal.media(spark, dir).rdd.getNumPartitions} " +
      s"unfanned=${mediaUnfanned(spark, dir).rdd.getNumPartitions}")
    spark.stop()
  }
}
