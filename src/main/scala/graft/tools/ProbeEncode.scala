package graft.tools

import graft.functions.{AvroCodec, Confluent}
import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: marginal cost of the serialize leg, old stack vs fused
  * direct encoder, on the cached sf0.1 weblog corpus (30 cols / 528
  * runes — the reference shape). Legs: parse-only, legacy
  * frame(to_avro(struct)), fused to_avro_confluent. */
object ProbeEncode {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def runs(label: String, f: => Unit): Unit = {
    System.gc(); Thread.sleep(200)
    val xs = Seq.fill(5)(t(f))
    println(f"[probe] $label: min=${xs.min}%.3f med=${xs.sorted.apply(2)}%.3f " +
      xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-encode")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1-weblog-4g"
    val schema = graft.Bench.weblogFixed
    val parsed = FixedWidthParser.parse(spark.read.text(dir), schema, Strict)
    val cols = schema.fields.map(f => col(f.name))
    val legacy = parsed.select(Confluent.frame(
      AvroCodec.to_avro(struct(cols: _*), schema.avroJson), 42).as("value"))
    val fused = parsed.select(
      AvroCodec.to_avro_confluent(cols, schema.avroJson, 42).as("value"))
    force(parsed) // warmup: codegen + page cache
    runs("parse", force(parsed))
    runs("legacy", force(legacy))
    runs("fused", force(fused))
    runs("legacy2", force(legacy))
    runs("fused2", force(fused))
    spark.stop()
  }
}
