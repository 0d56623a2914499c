package graft.tools

import graft.ops.Docs
import org.apache.spark.sql.functions._

// Leg attribution for dedup_minhash at sf0.1.
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Docs.documents(spark, dir)
    println(s"PROBE docs=${docs.count()}")
    val sh = Docs.shingled(docs)
    time("warmup") { force(sh) }
    time("shingles") { force(sh) }
    val hashed = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), hash(col("s")).cast("long").bitwiseAND(lit(0x7fffffffL)).as("h"))
    time("explode+hash") { force(hashed) }
    println(s"PROBE shingleRows=${hashed.count()}")
    val minCols = (0 until 64).map(j => min((col("h") * lit(1000003L + j) + lit(j)) % lit(2147483647L)).as(s"m$j"))
    time("64 min aggs") { force(hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)) }
    time("full dedup_minhash") { force(graft.ops.Dedup.dedupMinhash(spark, dir)) }
    spark.stop()
  }
}
