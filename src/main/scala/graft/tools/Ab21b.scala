package graft.tools

import org.apache.spark.sql.DataFrame

/** r21 conf-gated A/B: time registered queries with
  * spark.graft.dedup.shareSignatures on vs off, interleaved. */
object Ab21b {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-ab21b")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      def run(share: Boolean): Double = {
        spark.conf.set(graft.ops.Dedup.ShareSignaturesConf, share.toString)
        graft.Bench.gcBarrier()
        time(force(fn(spark, dir)))
      }
      run(false); run(true) // warm both plans
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 3).foreach { _ => off += run(false); on += run(true) }
      println(f"AB $q off=${med(off.toSeq)}%.2f ${off.map(t => f"$t%.2f").mkString("[", ",", "]")} " +
        f"on=${med(on.toSeq)}%.2f ${on.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
