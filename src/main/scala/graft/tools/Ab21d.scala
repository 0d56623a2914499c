package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** r21: interleaved A/B of the OLD corpus_lm_score formulation vs the
  * registered one, with wall AND summed task/cpu time per run. */
object Ab21d {
  private def lmOld(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.ops.Docs.fanned(spark, dir)
      .where(length(col("text")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3)))).as("tri"))
    val c3 = t.groupBy("tri").agg(count(lit(1)).as("c3"))
    val c2 = t.groupBy(substring(col("tri"), 1, 2).as("pre"))
      .agg(count(lit(1)).as("c2"))
    val sc = c3.join(c2, substring(col("tri"), 1, 2) === col("pre"))
      .select(col("tri"), expr(s"(1000000 * c3) div c2").as("p"))
    val perDoc = t.join(broadcast(sc), "tri")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"), sum(col("p")).as("score_sum"))
      .withColumn("si", expr("score_sum div n_tri"))
    val hist = perDoc.groupBy("si").agg(count(lit(1)).as("cnt"))
    val cumWin = org.apache.spark.sql.expressions.Window.orderBy("si")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val nDocs = hist.agg(sum(col("cnt")).as("n_docs"))
    val thr = hist.withColumn("cum", sum(col("cnt")).over(cumWin))
      .crossJoin(broadcast(nDocs))
      .where(col("cum") >= expr(s"(n_docs * 15) div 100 + 1"))
      .agg(min(col("si")).as("thr"))
    perDoc.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_tri"), col("score_sum"),
        round(col("score_sum").cast("double") / col("n_tri"), 6).as("avg_score"),
        (col("si") >= col("thr")).as("keep"))
      .orderBy("doc_id")
  }

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-ab21d")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpu = new AtomicLong; val tt = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { tt.addAndGet(m.executorRunTime); cpu.addAndGet(m.executorCpuTime / 1000000L) }
        ()
      }
    })
    val neu = graft.SparkEntry.queries("corpus_lm_score")
    def run(f: => DataFrame): (Double, Double, Double) = {
      graft.Bench.gcBarrier()
      Thread.sleep(150); tt.set(0); cpu.set(0)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      (w, tt.get / 1000.0, cpu.get / 1000.0)
    }
    run(lmOld(spark, dir)); run(neu(spark, dir))
    (1 to 4).foreach { i =>
      val o = run(lmOld(spark, dir)); val n = run(neu(spark, dir))
      println(f"run$i old wall=${o._1}%.2f taskT=${o._2}%.1f cpuT=${o._3}%.1f | " +
        f"new wall=${n._1}%.2f taskT=${n._2}%.1f cpuT=${n._3}%.1f")
    }
    spark.stop()
  }
}
