package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r21 in-JVM A/B: OLD formulations of the queries being reworked,
  * timed interleaved with the NEW registered ones under identical
  * machine conditions (alternating runs, median of 3 each). Delete
  * after the round. */
object Ab21 {

  // ---- OLD q1_pricing (un-fanned scan)
  private def q1Old(spark: SparkSession, dir: String): DataFrame = {
    def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    val one = lit(1).cast(DecimalType(3, 2))
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DecimalType(18, 2))
          .cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DecimalType(18, 2))
          .cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast(DecimalType(27, 4)).cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
          * (one + dec2(col("l_tax")))).cast(DecimalType(27, 6))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---- OLD corpus_lm_score (triple-explode)
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

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-ab-r21")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs: Seq[(String, (SparkSession, String) => DataFrame, (SparkSession, String) => DataFrame)] = Seq(
      ("q1_pricing", (s: SparkSession, d: String) => q1Old(s, d),
        graft.SparkEntry.queries("q1_pricing")),
      ("corpus_lm_score", (s: SparkSession, d: String) => lmOld(s, d),
        graft.SparkEntry.queries("corpus_lm_score")))
    pairs.foreach { case (name, old, neu) =>
      force(old(spark, dir)); force(neu(spark, dir)) // warm both
      val oldT = scala.collection.mutable.ArrayBuffer.empty[Double]
      val neuT = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 3).foreach { _ =>
        graft.Bench.gcBarrier(); oldT += time(force(old(spark, dir)))
        graft.Bench.gcBarrier(); neuT += time(force(neu(spark, dir)))
      }
      println(f"AB $name old=${med(oldT.toSeq)}%.2f ${oldT.map(t => f"$t%.2f").mkString("[", ",", "]")} " +
        f"new=${med(neuT.toSeq)}%.2f ${neuT.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
