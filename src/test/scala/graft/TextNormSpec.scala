package graft

import graft.functions.TextNorm
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Text normalization coverage. The fixture pipeline is value-checked
  * by the DuckDB oracle (text_normalize); these specs pin the Unicode
  * behavior the ASCII fixture cannot reach, the contract's fixpoint
  * property, and the codegen packaging. */
class TextNormSpec extends SparkSpec {

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextNorm.normalize_text(col("t"))).head().getString(0)
  }

  test("NFC composes decomposed accents (e + combining acute = \u00e9)") {
    val decomposed = "cafe\u0301"  // e + U+0301 COMBINING ACUTE
    val precomposed = "caf\u00e9"  // \u00e9 precomposed
    assert(norm(decomposed) == precomposed)
    // and an already-composed input is untouched
    assert(norm(precomposed) == precomposed)
    // the point of normalizing before dedup: the two spellings now
    // hash identically
    assert(norm(decomposed) == norm(precomposed))
  }

  test("lowercases, maps C0/DEL to spaces, collapses runs, trims") {
    assert(norm("  Hello\tWORLD\r\n") == "hello world")
    assert(norm("a\u0000b\u007fc") == "a b c")
    assert(norm("\t\r\n ") == "")
    // Unicode spaces are CONTENT, not layout: they survive (matching
    // the oracle's ' +' collapse, which also leaves them alone)
    assert(norm("a b") == "a b")
  }

  test("normalization is idempotent (a fixpoint on its own output)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(TextNorm.normalize_text(col("text")).as("once"))
      .select(col("once"), TextNorm.normalize_text(col("once")).as("twice"))
    assert(docs.where(col("once") =!= col("twice")).count() == 0L)
  }

  test("null text stays null; codegen'd map-side plan") {
    import spark.implicits._
    val out = Seq(Some("A"), None).toDF("t")
      .select(TextNorm.normalize_text(col("t")).as("n"))
    assert(out.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("a"), None))
    val q = TextAnalysis.textNormalize(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n${plan.take(600)}")
    assert(plan.contains("normalize_text"), plan.take(600))
  }

  test("SQL surface: normalize_text registered and equal to the Column API") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("tn_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, normalize_text(text) AS n FROM tn_docs ORDER BY doc_id")
    val viaCol = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), TextNorm.normalize_text(col("text")).as("n"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq == viaCol.collect().toSeq)
  }
}
