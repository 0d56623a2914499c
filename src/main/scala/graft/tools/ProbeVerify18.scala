package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

// r18 negative/positive A/B records:
//  - minhash verify re-attach behind an explicit doc_id exchange: NO
//    gain (AQE stage reuse already covers the fanOut exchange).
//  - simhash sig frame evaluated 3x (bands + two verify re-attaches):
//    A/B an explicit exchange on the sig frame.
object ProbeVerify18 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "verify18")
    val sf = "/root/testdata/sf0.1"
    import graft.ops.Dedup
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] warm: ${runs.map(r => f"$r%.2f").mkString(", ")}")
    }
    t("prod_dedup_simhash")(noop(Dedup.dedupSimhash(spark, sf)))
    def simhashRepart() = {
      val sig = Dedup.simhashSig(spark, sf).repartition(col("doc_id"))
      val banded = sig.select(col("doc_id"), posexplode(array(
        col("sim_hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("sim_hi"), 16).bitwiseAND(lit(0xffffL)),
        col("sim_lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("sim_lo"), 16).bitwiseAND(lit(0xffffL)))).as(Seq("band", "sig")))
      val hamming =
        bit_count(col("sa.sim_hi").bitwiseXOR(col("sb.sim_hi"))) +
        bit_count(col("sa.sim_lo").bitwiseXOR(col("sb.sim_lo")))
      Dedup.bandedCandidates(banded, "doc_id")
        .select(col("a").as("doc_a"), col("b").as("doc_b"))
        .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), hamming.cast(IntegerType).as("hamming"))
        .filter(col("hamming") <= Dedup.HammingMax)
        .orderBy("doc_a", "doc_b")
    }
    t("simhash_repart_sig")(noop(simhashRepart()))
    spark.stop()
  }
}
