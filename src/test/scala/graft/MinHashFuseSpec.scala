package graft

import graft.ops.{Dedup, Docs}
import org.apache.spark.sql.functions._

/** The fused one-pass MinHash expression must be BIT-identical to the
  * explode + 64-min-aggregator chain it replaced — the persisted band
  * store and every pair-graph artifact are derived from these minima,
  * so even a one-permutation drift would silently orphan existing
  * artifacts. Pins the corpus, the edge cases the corpus can't reach,
  * and the plan shape the fusion exists to buy. */
class MinHashFuseSpec extends SparkSpec {

  test("fused signature == aggregated chain on the corpus, row for row") {
    val sh = Docs.shingled(Docs.documents(spark, sf))
    val fused = Dedup.minhashSigs(sh)
    val agg = Dedup.minhashSigsAgg(sh)
    assert(fused.count() == agg.count())
    val diff = fused.as("f").join(agg.as("g"), "doc_id")
      .where(col("f.sig") =!= col("g.sig"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("empty shingle array: absent from signatures, like the explode") {
    import spark.implicits._
    val sh = Seq(
      (1L, Seq("a b c")),
      (2L, Seq.empty[String])).toDF("doc_id", "sh")
    val fused = Dedup.minhashSigs(sh).select("doc_id").collect().map(_.getLong(0))
    assert(fused.toSeq == Seq(1L))
    // same absence the old chain produced
    assert(Dedup.minhashSigsAgg(sh).select("doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("null shingle element votes as hash(null)=seed, like the old chain") {
    import spark.implicits._
    val sh = Seq((1L, Seq[String]("x y z", null)))
      .toDF("doc_id", "sh")
    val fused = Dedup.minhashSigs(sh).select("sig").head().getSeq[Long](0)
    val agg = Dedup.minhashSigsAgg(sh).select("sig").head().getSeq[Long](0)
    assert(fused == agg)
  }

  test("signature stage runs map-side inside whole-stage codegen") {
    val df = Dedup.minhashSigs(Docs.shingled(Docs.documents(spark, sf)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("minhash64"), plan.take(600))
    assert(plan.contains("*("), s"no codegen span:\n${plan.take(600)}")
    // the signature no longer rides an exchange: no shuffle between
    // the scan and the signature projection
    assert(!plan.contains("Exchange"),
      s"signature stage still shuffles:\n${plan.take(1200)}")
  }

  test("SQL surface: minhash64 equals the Column API") {
    GraftExtensions.register(spark)
    Docs.shingled(Docs.documents(spark, sf)).createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash64(sh) AS sig FROM mh_docs ORDER BY doc_id")
    val viaCol = Dedup.minhashSigs(Docs.shingled(Docs.documents(spark, sf)))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq == viaCol.collect().toSeq)
  }
}
