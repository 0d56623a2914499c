package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.parse.{Compat, FixedWidthParser, Strict}
import graft.sources.FixedWidth

/** r21: ingest-leg A/B — fanned vs unfanned lineitem below the render,
  * interleaved, at the ambient core count. */
object Ab21c {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-ab21c")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    val fx = graft.ops.Pipeline.lineitemFixed
    def barrier(df: DataFrame): DataFrame =
      df.repartition(df.sparkSession.sparkContext.defaultParallelism,
        df.columns.map(col): _*)
    val orderCols = fx.fields.map(f => col(f.name))
    def spacepadOver(li: DataFrame): DataFrame = {
      val rendered = barrier(FixedWidth.render(li, fx))
      FixedWidthParser.parse(rendered, fx, Compat, dropFooter = false)
        .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }
    def toavroOver(li: DataFrame): DataFrame = {
      val schemaId = 42
      val rendered = barrier(FixedWidth.render(li, fx))
      val framed = FixedWidthParser.toAvro(rendered, fx, schemaId, dropFooter = false)
      barrier(framed.select(graft.functions.AvroCodec.from_avro_rows(
        col("value"), Map(schemaId -> fx.avroJson), fx.avroJson, fx.sparkSchema)))
        .orderBy(orderCols: _*)
    }
    val plain = (s: SparkSession, d: String) => s.read.parquet(s"$d/lineitem.parquet")
    val fanned = (s: SparkSession, d: String) => graft.ops.Similarity.fanOut(
      s, d, "lineitem", s.read.parquet(s"$d/lineitem.parquet"), col("l_orderkey"))
    val cases = Seq(
      ("spacepad", spacepadOver _),
      ("toavro", toavroOver _))
    cases.foreach { case (name, mk) =>
      force(mk(plain(spark, dir))); force(mk(fanned(spark, dir)))
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 3).foreach { _ =>
        graft.Bench.gcBarrier(); off += time(force(mk(plain(spark, dir))))
        graft.Bench.gcBarrier(); on += time(force(mk(fanned(spark, dir))))
      }
      println(f"AB $name unfanned=${med(off.toSeq)}%.2f ${off.map(t => f"$t%.2f").mkString("[", ",", "]")} " +
        f"fanned=${med(on.toSeq)}%.2f ${on.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
